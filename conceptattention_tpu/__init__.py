"""ConceptAttention-TPU: a TPU-native JAX framework for training-free concept
saliency extraction from multi-modal diffusion transformers.

Re-designed from scratch for TPU (JAX/XLA/Pallas/pjit) with the capabilities of
the PyTorch reference `manuragkhullar/ConceptAttention` (see SURVEY.md):
a Flux-style rectified-flow DiT with a first-class optional concept-token
stream, fused concept-saliency extraction, a mesh-sharded forward/training
path, the public `ConceptAttentionFluxPipeline` API, and the zero-shot
segmentation evaluation harness.

Public API parity target: `concept_attention/__init__.py:2` in the reference.
"""

__version__ = "0.2.0"  # keep in sync with pyproject.toml


def resolve_jax_platforms(want: str) -> str:
    """Canonicalize an explicit JAX_PLATFORMS value for this package.

    Keeps the cpu backend reachable even under e.g. JAX_PLATFORMS=axon:
    host-side staging (quantize-then-device_put) uses
    jax.default_device(jax.devices("cpu")[0]), and jax keeps the FIRST entry
    as the default platform, so appending cpu changes nothing else. A user
    who deliberately wants a single-platform restriction opts out with
    CONCEPTATTENTION_NO_CPU_APPEND=1 or a trailing "!" (stripped either way).
    Shared by package import and bench.py so the policy lives in one place.
    """
    import os

    if want.endswith("!"):
        return want[:-1]
    if os.environ.get("CONCEPTATTENTION_NO_CPU_APPEND") == "1":
        return want
    if "cpu" not in [p.strip().lower() for p in want.split(",")]:
        want += ",cpu"
    return want


def _honor_jax_platforms_env() -> None:
    """Restore standard JAX semantics for an EXPLICIT JAX_PLATFORMS env var.

    This environment's sitecustomize registers the axon TPU plugin and resets
    jax_platforms to "axon,cpu" after import, trampling a user's
    JAX_PLATFORMS=cpu — which silently routes experiment subprocesses to the
    remote TPU relay (minutes-long compiles). Re-applying the env value here
    is a no-op everywhere sitecustomize doesn't interfere.
    """
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    resolved = resolve_jax_platforms(want)
    try:
        import jax

        if jax.config.jax_platforms != resolved:
            if resolved != want:
                import logging

                logging.getLogger(__name__).debug(
                    "JAX_PLATFORMS=%s resolved to %s (cpu appended for "
                    "host-side staging; opt out with a trailing '!' or "
                    "CONCEPTATTENTION_NO_CPU_APPEND=1)", want, resolved,
                )
            jax.config.update("jax_platforms", resolved)
    except Exception:
        pass  # backends already initialized: leave whatever the host chose


_honor_jax_platforms_env()


def __getattr__(name):
    # Lazy public-API imports: keep `import conceptattention_tpu` light so ops
    # and model modules are usable without pulling the full pipeline stack.
    if name in ("ConceptAttentionFluxPipeline", "ConceptAttentionPipelineOutput"):
        from conceptattention_tpu.pipeline import concept_pipeline

        return getattr(concept_pipeline, name)
    if name == "compute_heatmaps_from_vectors":
        from conceptattention_tpu.pipeline import heatmaps

        return heatmaps.compute_heatmaps_from_vectors
    if name in ("load_lora", "merge_lora", "merge_loras", "convert_lora_state_dict"):
        from conceptattention_tpu.weights import lora

        return getattr(lora, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    # PEP 562 companion to __getattr__: make the lazy exports discoverable
    # to dir()/tab-completion.
    return sorted(set(globals()) | set(__all__))

__all__ = [
    "ConceptAttentionFluxPipeline",
    "ConceptAttentionPipelineOutput",
    "compute_heatmaps_from_vectors",
    "load_lora",
    "merge_lora",
    "merge_loras",
    "convert_lora_state_dict",
]
