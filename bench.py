"""Headline benchmark: flux-schnell-style generation + concept heatmaps.

Measures images/sec for a 4-step 1024x1024 rectified-flow generation with
4-concept saliency extraction (the BASELINE.json north-star config), plus the
heatmap-extraction overhead vs. a plain generation pass.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: BASELINE.json targets >= 1x A100 images/sec for the full 12B
flux-schnell. An A100 runs full flux-schnell 4-step 1024^2 at ~0.5 img/s
(~2 s/image, common public measurements; the reference repo publishes no
numbers — BASELINE.md). The benchmarked model is depth-scaled to fit a single
chip's HBM; throughput is normalized to full-depth equivalents by the
per-step FLOP ratio so the comparison is apples-to-apples.
"""

import json
import time

import jax
import jax.numpy as jnp


A100_FULL_FLUX_IMGS_PER_SEC = 0.5  # full 12B flux-schnell, 4-step 1024^2
FULL_DEPTH = (19, 38)


def main():
    from conceptattention_tpu.config import FluxConfig
    from conceptattention_tpu.models.flux.params import init_flux_params, param_count
    from conceptattention_tpu.ops.packing import make_img_ids
    from conceptattention_tpu.ops.schedule import get_schedule
    from conceptattention_tpu.sampling.rectified_flow import denoise

    dev = jax.devices()[0]
    hbm_bytes = None
    try:
        stats = dev.memory_stats()
        if stats:
            hbm_bytes = stats.get("bytes_limit")
    except Exception:
        pass
    if hbm_bytes is None:
        # memory_stats unavailable (e.g. the axon PJRT plugin): infer from the
        # device kind. v5 lite (v5e) = 16 GB HBM; default conservatively.
        kind = getattr(dev, "device_kind", "").lower()
        hbm_bytes = 16e9 if ("lite" in kind or "v5e" in kind) else 16e9

    # Full flux-schnell is ~11.9B params: 23.8 GB bf16 (needs >24 GB HBM) but
    # ~12 GB with weight-only int8 — the TRUE full-depth architecture fits a
    # 16 GB v5e chip quantized. Fall back to depth-scaling only if even int8
    # doesn't fit.
    depth, depth_single = FULL_DEPTH
    quantize = False
    if hbm_bytes is not None and hbm_bytes < 26e9:
        if hbm_bytes >= 14e9:
            quantize = True
        else:
            param_budget = hbm_bytes * 0.5
            n = max(1, int(param_budget / 1.25e9))
            depth, depth_single = min(19, n), min(38, 2 * n)

    cfg = FluxConfig(
        depth=depth, depth_single_blocks=depth_single, guidance_embed=False
    )
    dtype = jnp.bfloat16

    b, t, c = 1, 256, 4
    grid = (64, 64)  # 1024x1024 pixels -> 4096 image tokens
    p_tokens = grid[0] * grid[1]
    num_steps = 4

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 6)
    if quantize:
        # Direct int8 init: the full model never materializes in bf16.
        from conceptattention_tpu.ops.quant import init_flux_params_quantized

        params = init_flux_params_quantized(keys[0], cfg, dtype)
    else:
        params = init_flux_params(keys[0], cfg, dtype)
    img = jax.random.normal(keys[1], (b, p_tokens, cfg.in_channels), dtype)
    img_ids = make_img_ids(*grid, batch_size=b)
    txt = jax.random.normal(keys[2], (b, t, cfg.context_in_dim), dtype)
    txt_ids = jnp.zeros((b, t, 3), jnp.float32)
    y = jax.random.normal(keys[3], (b, cfg.vec_in_dim), dtype)
    concepts = jax.random.normal(keys[4], (b, c, cfg.context_in_dim), dtype)
    concept_ids = jnp.zeros((b, c, 3), jnp.float32)
    concept_vec = jnp.zeros((b, cfg.vec_in_dim), dtype)
    schedule = jnp.asarray(get_schedule(num_steps, p_tokens, shift=False))

    import functools

    from conceptattention_tpu.ops.attention import ConceptAttentionSpec

    @functools.partial(jax.jit, static_argnames=("with_concepts", "backend"))
    def run(params, img, with_concepts, backend):
        out, sal = denoise(
            params, cfg,
            img=img, img_ids=img_ids, txt=txt, txt_ids=txt_ids, vec=y,
            timesteps=schedule,
            concepts=concepts if with_concepts else None,
            concept_ids=concept_ids if with_concepts else None,
            concept_vec=concept_vec if with_concepts else None,
            spec=ConceptAttentionSpec(taps=("output", "cross_attention"), backend=backend),
        )
        return out, sal

    def timed(with_concepts, backend, iters=3):
        out, _ = run(params, img, with_concepts, backend)
        jax.block_until_ready(out)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out, sal = run(params, img, with_concepts, backend)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    results = {}
    # At full depth + int8 the XLA attention path's materialized logits don't
    # fit alongside the weights; only the flash kernel path is attempted.
    backends = ("pallas",) if quantize else ("xla", "pallas")
    for backend in backends:
        try:
            results[backend] = timed(True, backend)
        except Exception as e:  # pallas may be unavailable on some backends
            import sys

            print(f"# backend {backend} failed: {type(e).__name__}: {e}", file=sys.stderr)
    backend = min(results, key=results.get)
    t_with = results[backend]
    t_plain = timed(False, backend)
    overhead_pct = 100.0 * (t_with - t_plain) / t_plain

    imgs_per_sec = b / t_with
    # Normalize to full-depth FLOP-equivalents for the A100 comparison.
    flop_scale = (depth + 0.5 * depth_single) / (FULL_DEPTH[0] + 0.5 * FULL_DEPTH[1])
    imgs_per_sec_full_equiv = imgs_per_sec * flop_scale
    vs_baseline = imgs_per_sec_full_equiv / A100_FULL_FLUX_IMGS_PER_SEC

    print(json.dumps({
        "metric": (
            f"images/sec flux-schnell-d{depth}/{depth_single} 1024px 4-step "
            f"4-concept heatmaps, {'int8-weights' if quantize else 'bf16'}, "
            f"1 chip, attn={backend} "
            f"(full-depth-equiv {imgs_per_sec_full_equiv:.3f} img/s, "
            f"heatmap overhead {overhead_pct:.1f}%)"
        ),
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
