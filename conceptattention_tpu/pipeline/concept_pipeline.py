"""Public pipeline API: generate images + concept saliency heatmaps.

Parity target: `ConceptAttentionFluxPipeline`
(`concept_attention/concept_attention_pipeline.py:94-357` in
manuragkhullar/ConceptAttention) — `generate_image(prompt, concepts, ...)` and
`encode_image(image, concepts, ...)`, each returning
`ConceptAttentionPipelineOutput(image, concept_heatmaps, cross_attention_maps)`.

TPU-first differences:
  - the whole denoise loop (DiT scan x Euler scan) runs under one jit; only
    the final latents and the tiny [S, L, B, C, P] saliency-map stack leave
    the device (the reference stacks [T, 19, B, 4096, 3072] vector dicts on
    host);
  - no offload choreography — weights live in HBM (sharded over the mesh when
    one is provided);
  - checkpoints load via env vars (FLUX_SCHNELL / FLUX_DEV / AE) like the
    reference's util.py:28-93; without a checkpoint, params are randomly
    initialized (tests/benches) since this environment has no hub egress.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from conceptattention_tpu.config import ModelSpec, configs
from conceptattention_tpu.models.flux import autoencoder as vae
from conceptattention_tpu.models.flux.dit import flux_forward
from conceptattention_tpu.models.flux.params import init_flux_params
from conceptattention_tpu.models.text.encoders import (
    StubTextEncoders,
    TextEncoders,
    embed_concepts,
)
from conceptattention_tpu.ops.attention import ConceptAttentionSpec, default_backend
from conceptattention_tpu.ops.packing import make_img_ids, pack_latents, unpack_latents
from conceptattention_tpu.ops.schedule import get_schedule
from conceptattention_tpu.pipeline.heatmaps import heatmaps_to_pil, reduce_maps
from conceptattention_tpu.sampling.rectified_flow import denoise, forward_noise, get_noise
from conceptattention_tpu.utils.images import as_float01_chw


@dataclasses.dataclass
class ConceptAttentionPipelineOutput:
    image: Any  # PIL.Image.Image | np.ndarray
    concept_heatmaps: Union[List[Any], np.ndarray]
    cross_attention_maps: Union[List[Any], np.ndarray]


@functools.partial(jax.jit, static_argnames=("cfg", "spec", "guidance_embed"))
def _generate_latents(
    params, cfg, noise, img_ids, txt, txt_ids, vec,
    concepts, concept_ids, concept_vec, timesteps, guidance,
    spec, guidance_embed,
):
    img, saliency = denoise(
        params, cfg,
        img=noise, img_ids=img_ids, txt=txt, txt_ids=txt_ids, vec=vec,
        timesteps=timesteps, guidance=guidance,
        concepts=concepts, concept_ids=concept_ids, concept_vec=concept_vec,
        spec=spec,
    )
    return img, saliency


def batched_noise_saliency(
    pipe, z, t, num_samples, height, width, seed,
    txt, txt_ids, vec, c_emb, c_ids, c_vec, spec, stop_after=True,
):
    """Forward-noise `z` with per-sample keys PRNGKey(seed + i), run ONE
    batched encode forward, and return the saliency dict transposed to
    [N_samples, L, 1, C, P] (samples as the leading/"time" axis).

    Shared by `encode_image` and the segmentation baselines (the reference
    loops num_samples separate forwards, concept_attention_pipeline.py:
    318-335; batching them fills the MXU and amortizes dispatch). The noise
    draws are keyed exactly like the sequential loop was.
    """
    _, _, lh, lw = z.shape
    noised = jnp.concatenate(
        [
            forward_noise(
                z,
                get_noise(
                    jax.random.PRNGKey(seed + i), 1, height, width, pipe.dtype,
                    channels=pipe.spec.ae_params.z_channels,
                    vae_factor=pipe.vae_factor,
                ),
                t,
            )
            for i in range(num_samples)
        ],
        axis=0,
    )  # [N, C, H', W']
    n = num_samples
    bc = lambda a: jnp.broadcast_to(a, (n, *a.shape[1:]))  # noqa: E731
    saliency = _encode_forward(
        pipe.params, pipe.cfg, pack_latents(noised),
        make_img_ids(lh // 2, lw // 2, n),
        bc(txt), bc(txt_ids), bc(vec), bc(c_emb), bc(c_ids), bc(c_vec),
        jnp.full((n,), t, dtype=jnp.float32),
        spec, stop_after=stop_after,
    )
    # [L, N, C, P] -> samples leading [N, L, 1, C, P]
    return jax.tree.map(
        lambda a: jnp.transpose(a, (1, 0, 2, 3))[:, :, None], saliency
    )


def batched_images_saliency(
    pipe, zs, t, num_samples, height, width, seed,
    txts, txt_ids, vec, c_embs, c_ids, c_vecs, spec, stop_after=True,
):
    """Multi-image variant of `batched_noise_saliency`: B images × N noise
    samples in ONE stopped forward (the eval harness's throughput lever —
    the per-eval-image marginal cost at B=4 already drops ~2.9× vs B=1,
    `bench.py --encode`). Inputs carry a leading image axis: `zs`
    [B, Cz, H', W'], `txts` [B, T, d], `c_embs` [B, C, d] (per-image concept
    lists may differ but must share a length), `vec`/`c_vecs` [B, d].

    `seed` may be one int (every image keys sample i as PRNGKey(seed + i) —
    exactly what B separate `segment_individual_image` calls draw, since
    each uses the same model-level seed) or a per-image sequence (coalesced
    serving requests with distinct seeds: image b keys PRNGKey(seed_b + i),
    matching what its own single-image `encode_image` would draw). Returns
    the saliency dict as [B, N, L, C, P] (image leading)."""
    B, _, lh, lw = zs.shape
    n = num_samples
    seeds = _seeds_list(seed, B)
    keys = jnp.stack([
        jax.random.PRNGKey(seeds[b] + i)
        for i in range(n) for b in range(B)  # sample-major
    ])
    eps = _noise_for_keys(
        keys, height, width, pipe.dtype,
        pipe.spec.ae_params.z_channels, pipe.vae_factor,
    )  # [N*B, Cz, H', W']
    tile = lambda a: jnp.concatenate([a] * n, axis=0)  # noqa: E731
    noised = forward_noise(tile(zs), eps, t)  # [N*B, ...], sample-major
    saliency = _encode_forward(
        pipe.params, pipe.cfg, pack_latents(noised),
        make_img_ids(lh // 2, lw // 2, n * B),
        tile(txts), tile(txt_ids), tile(vec), tile(c_embs), tile(c_ids),
        tile(c_vecs), jnp.full((n * B,), t, dtype=jnp.float32),
        spec, stop_after=stop_after,
    )
    # [L, N*B, C, P] -> image-leading [B, N, L, C, P]
    return jax.tree.map(
        lambda a: jnp.transpose(
            a.reshape(a.shape[0], n, B, *a.shape[2:]), (2, 1, 0, 3, 4)
        ),
        saliency,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "spec", "stop_after"))
def _encode_forward(
    params, cfg, img, img_ids, txt, txt_ids, vec,
    concepts, concept_ids, concept_vec, t_vec,
    spec, stop_after=True,
):
    _, saliency = flux_forward(
        params, cfg,
        img=img, img_ids=img_ids, txt=txt, txt_ids=txt_ids,
        timesteps=t_vec, y=vec,
        guidance=jnp.zeros_like(t_vec) if cfg.guidance_embed else None,
        concepts=concepts, concept_ids=concept_ids, concept_vec=concept_vec,
        stop_after_multimodal_attentions=stop_after,
        spec=spec,
    )
    return saliency


@functools.partial(
    jax.jit, static_argnames=("cfg", "h_tokens", "w_tokens", "dtype")
)
def _vae_decode(ae_params, cfg, latents_packed, h_tokens, w_tokens,
                dtype=jnp.float32):
    """NHWC decode at `dtype` (identical math to NCHW,
    tests/test_autoencoder_nhwc.py; avoids the per-conv relayouts XLA
    inserts on TPU at 1024^2).

    dtype resolution is the pipeline's `decode_dtype`: bf16 on TPU-like
    backends — the reference itself decodes under torch.autocast(bfloat16)
    (raw_output_space.py:219-221), it is the path the decode kernels are
    chip-validated on, and the f32 conv3x3 / 16k-mid-attention variants
    exceed this chip's scoped-VMEM compile limits — f32 on CPU (tests,
    exact parity)."""
    z = unpack_latents(latents_packed.astype(dtype), h_tokens, w_tokens)
    return vae.decode_nhwc(
        jax.tree.map(lambda x: x.astype(dtype), ae_params), cfg, z
    )


@functools.partial(jax.jit, static_argnames=("cfg", "sample"))
def _vae_encode(ae_params, cfg, x, keys, sample=True):
    """NCHW VAE encode under ONE jit. The eager spelling (op-by-op
    `vae.encode`) dispatches ~200 ops; at this backend's 30-90 ms
    per-dispatch overhead that alone would dominate the eval path — jitted,
    the 1024² encode measures 72.9 ms on-chip (`bench.py --encode`).

    `keys` is a stacked [B] array of per-image PRNG keys (None when
    sample=False: posterior mean, the deterministic-eval mode — the
    reference's DiagonalGaussian(sample=...), flux
    modules/autoencoder.py:262-274). Each image's reparameterization draw is
    normal(key_b, mean.shape[1:]) — bit-identical to the [1, ...]-shaped
    draw a single-image encode makes with the same key (same counter
    count), so batched == per-image holds even when coalesced requests
    carry DISTINCT seeds (the served-encode case), and images sharing a
    seed share the draw (the eval-harness case)."""
    moments = vae.encoder_apply(ae_params["encoder"], cfg, x)
    mean, logvar = jnp.split(moments, 2, axis=1)
    if sample:
        eps = jax.vmap(
            lambda k: jax.random.normal(k, mean.shape[1:], mean.dtype)
        )(keys)
        z = mean + jnp.exp(0.5 * logvar) * eps
    else:
        z = mean
    return cfg.scale_factor * (z - cfg.shift_factor)


def _seeds_list(seed, batch: int) -> list:
    """Normalize an int-or-sequence seed argument to a per-image list."""
    if np.isscalar(seed):
        return [int(seed)] * batch
    seeds = [int(s) for s in seed]
    assert len(seeds) == batch, f"{len(seeds)} seeds for {batch} images"
    return seeds


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "dtype", "channels", "vae_factor"),
)
def _noise_for_keys(keys, height, width, dtype, channels, vae_factor):
    """[K] stacked keys -> [K, Cz, H', W'] latent noise; each row is
    bit-identical to `get_noise(key, 1, ...)[0]` for that key."""
    return jax.vmap(
        lambda k: get_noise(k, 1, height, width, dtype,
                            channels=channels, vae_factor=vae_factor)[0]
    )(keys)


def _vae_decode_f32(ae_params, cfg, latents_packed, h_tokens, w_tokens):
    # Backwards-compatible f32 spelling (tests, CPU parity paths).
    return _vae_decode(ae_params, cfg, latents_packed, h_tokens, w_tokens,
                       dtype=jnp.float32)


# NOTE a single-dispatch lax.map batch decode was tried twice and measured
# dead both times: round 3 found chunked lax.map 1.5x slower and full-batch
# RESOURCE_EXHAUSTED next to the resident DiT; round 4's retry hit a scoped-
# VMEM OOM inside the f32 conv3x3 Pallas kernel under the while-loop body
# (123.7M vs the 96.25M stack limit at the 512^2 x 256 stage — the same
# kernel fits when compiled outside a loop). Per-image dispatches with
# DEFERRED fetches (below) get the overlap without the loop-body limits.


class ConceptAttentionFluxPipeline:
    """Generate / encode images with Flux and extract concept heatmaps."""

    def __init__(
        self,
        model_name: str = "flux-schnell",
        dtype=jnp.bfloat16,
        params: Optional[dict] = None,
        ae_params: Optional[dict] = None,
        text_encoders: Optional[TextEncoders] = None,
        mesh=None,
        init_seed: int = 0,
        # Quantization of the layer stacks: False, True/"w8" (weight-only
        # int8 — full flux fits a 16 GB chip), "w8a8" (int8 activations too:
        # int8 x int8 on the MXU, 2x bf16 peak — the bench serving path), or
        # "w4" (group-wise int4 weights, ~6 GB full flux — headroom for
        # larger serving batches; quality-gated in tests/test_quant.py).
        quantize: Union[bool, str] = False,
        offload_model: bool = False,  # accepted for API parity; TPU HBM holds the model
        device: Optional[str] = None,  # API parity; placement is mesh-driven
        # Attention backend override ("xla" / "pallas" / "ring" /
        # "pallas_interpret"); None picks per device. int8_qk additionally
        # computes attention scores int8 x int8 on the MXU (Pallas backends;
        # quality-gated in tests/test_quant.py::TestInt8QKEndToEndQuality).
        attention_backend: Optional[str] = None,
        int8_qk: bool = False,
        # LoRA adapters: a safetensors path, an already-converted adapter
        # pytree (weights/lora.py), or a sequence of either; merged into the
        # DiT weights at load time (before quantization on the checkpoint
        # path, so int8 cells quantize the adapted weights).
        lora: Optional[Any] = None,
        lora_strength: Union[float, Sequence[float]] = 1.0,
        # Retain a pristine host-side copy of the pre-merge weights so
        # swap_loras() can re-base to a different adapter set at runtime
        # (the serving daemon's /v1/loras endpoint). Opt-in: the snapshot
        # costs host RAM (~the model's unquantized or quantized size).
        keep_base_for_swap: bool = False,
    ):
        self.spec: ModelSpec = configs[model_name]
        self.model_name = model_name
        self.is_schnell = "schnell" in model_name or model_name == "flux-tiny"
        self.cfg = self.spec.params
        self.dtype = dtype
        self.mesh = mesh
        # VAE spatial downsample factor (8x for Flux: 3 stride-2 stages).
        self.vae_factor = 2 ** (len(self.spec.ae_params.ch_mult) - 1)

        self._quantize = quantize
        self._swap_base = None  # set by _snapshot_base when keep_base_for_swap
        self._swap_stage = "final"
        self._active_loras: List[dict] = []
        adapters, strengths, self._active_loras = self._load_adapters(
            lora, lora_strength
        )

        def _snapshot_base(p, stage):
            """Host-side pristine copy for swap_loras (np leaves; quantized
            cell dicts survive as dicts of np arrays)."""
            if keep_base_for_swap:
                import numpy as _np

                self._swap_base = jax.tree.map(
                    lambda x: _np.asarray(x) if hasattr(x, "shape") else x, p
                )
                self._swap_stage = stage

        def _merged(p, stage="final"):
            _snapshot_base(p, stage)
            if not adapters:
                return p
            from conceptattention_tpu.weights.lora import merge_loras

            return merge_loras(p, adapters, strengths)

        if params is None:
            ckpt = self.spec.ckpt_path
            if ckpt:
                from conceptattention_tpu.weights.convert import (
                    convert_flux_state_dict,
                    load_safetensors,
                )

                if quantize:
                    # Convert AND quantize on host memory, then move only the
                    # int8 weights + scales to the accelerator — staging the
                    # full ~24 GB bf16 tree in HBM first would OOM the 16 GB
                    # chip the int8 path exists for.
                    from conceptattention_tpu.ops.quant import quantize_flux_params

                    with jax.default_device(jax.devices("cpu")[0]):
                        params = convert_flux_state_dict(
                            load_safetensors(ckpt), self.cfg, dtype
                        )
                        # Merge adapters BEFORE quantizing so the int8 cells
                        # quantize the adapted weights (merging after would
                        # requantize twice and lose precision). The swap base
                        # is the pre-quantize bf16 tree for the same reason.
                        params = _merged(params, stage="prequant")
                        from conceptattention_tpu.ops.quant import resolve_quant_mode

                        params = quantize_flux_params(
                            params, mode=resolve_quant_mode(quantize)
                        )
                    params = jax.device_put(params)
                else:
                    params = _merged(convert_flux_state_dict(
                        load_safetensors(ckpt), self.cfg, dtype
                    ))
            elif quantize:
                from conceptattention_tpu.ops.quant import (
                    init_flux_params_quantized,
                    resolve_quant_mode,
                )

                params = _merged(init_flux_params_quantized(
                    jax.random.PRNGKey(init_seed), self.cfg, dtype,
                    mode=resolve_quant_mode(quantize),
                ))
            else:
                params = _merged(
                    init_flux_params(jax.random.PRNGKey(init_seed), self.cfg, dtype)
                )
        else:
            params = _merged(params)  # no-op without adapters; snapshots base
        if ae_params is None:
            ae_ckpt = self.spec.ae_path
            if ae_ckpt:
                from conceptattention_tpu.weights.convert import (
                    convert_autoencoder_state_dict,
                    load_safetensors,
                )

                ae_params = convert_autoencoder_state_dict(
                    load_safetensors(ae_ckpt), self.spec.ae_params, jnp.float32
                )
            else:
                ae_params = vae.init_autoencoder_params(
                    jax.random.PRNGKey(init_seed + 1), self.spec.ae_params, jnp.float32
                )
        self.params = params
        self.ae_params = ae_params

        if mesh is not None:
            from conceptattention_tpu.parallel.sharding import shard_params

            self.params = shard_params(self.params, mesh, self.cfg)

        if text_encoders is None:
            text_encoders = StubTextEncoders(
                t5_dim=self.cfg.context_in_dim,
                clip_dim=self.cfg.vec_in_dim,
                t5_max_length=self.spec.t5_max_length,
            )
        self.text_encoders = text_encoders
        self.attention_backend = attention_backend or default_backend()
        if int8_qk and self.attention_backend not in ("pallas", "pallas_interpret"):
            raise ValueError(
                f"int8_qk=True requires a Pallas attention backend; resolved "
                f"backend is {self.attention_backend!r}. Pass "
                f"attention_backend='pallas' (TPU) or 'pallas_interpret' (CPU "
                f"tests), or drop int8_qk."
            )
        self.int8_qk = int8_qk
        # Decode dtype: bf16 on TPU-like backends (reference-autocast-
        # faithful, chip-validated kernel path; the f32 conv3x3 / 16k
        # mid-attention variants fail this chip's scoped-VMEM compile
        # limits), f32 elsewhere (CPU tests keep exact parity) — see
        # _vae_decode.
        try:
            backend = jax.default_backend().lower()
        except Exception:
            backend = "cpu"
        self.decode_dtype = (
            jnp.bfloat16 if ("tpu" in backend or "axon" in backend)
            else jnp.float32
        )

    # ------------------------------------------------------------------
    def _load_adapters(self, lora, lora_strength):
        """(adapters, strengths, descriptors) from the public `lora` forms:
        a safetensors path, a converted adapter pytree, or a sequence of
        either; descriptors are JSON-able {"source", "strength"} records for
        the serving daemon's GET /v1/loras."""
        adapters: List[Any] = []
        sources: List[str] = []
        if lora is not None:
            from conceptattention_tpu.weights.lora import load_lora

            items = lora if isinstance(lora, (list, tuple)) else [lora]
            for it in items:
                if isinstance(it, str):
                    adapters.append(load_lora(it, self.cfg))
                    sources.append(it)
                else:
                    adapters.append(it)
                    sources.append("<adapter pytree>")
        strengths = (
            list(lora_strength)
            if isinstance(lora_strength, (list, tuple))
            else [float(lora_strength)] * len(adapters)
        )
        if len(strengths) != len(adapters):
            raise ValueError(
                f"{len(adapters)} LoRA adapter(s) but {len(strengths)} strengths"
            )
        descriptors = [
            {"source": s, "strength": float(st)}
            for s, st in zip(sources, strengths)
        ]
        return adapters, strengths, descriptors

    @property
    def active_loras(self) -> List[dict]:
        """JSON-able descriptors of the currently merged adapter set."""
        return list(self._active_loras)

    def swap_loras(
        self,
        lora: Optional[Any] = None,
        lora_strength: Union[float, Sequence[float]] = 1.0,
    ) -> List[dict]:
        """Replace the active LoRA set at runtime from the pristine base
        retained by `keep_base_for_swap=True` (lora=None clears adapters).

        Rebuilds exactly what construction would have built: on the
        checkpoint+quantize path the base is the pre-quantize bf16 tree, so
        the new adapters merge in float and the cells quantize the adapted
        weights (never requantize-on-requantize); on other paths the base is
        the pre-merge tree and quantized cells requantize in kind. Not
        thread-safe against in-flight forwards — the serving daemon runs
        swaps on its batcher worker so they serialize with generation.
        Returns the new active-adapter descriptors."""
        if self._swap_base is None:
            raise RuntimeError(
                "swap_loras needs keep_base_for_swap=True at construction "
                "(the pipeline does not retain its pre-merge weights by "
                "default — they cost host RAM)"
            )
        adapters, strengths, descriptors = self._load_adapters(lora, lora_strength)
        from conceptattention_tpu.weights.lora import merge_loras

        if self._swap_stage == "prequant":
            from conceptattention_tpu.ops.quant import (
                quantize_flux_params,
                resolve_quant_mode,
            )

            with jax.default_device(jax.devices("cpu")[0]):
                p = self._swap_base
                if adapters:
                    p = merge_loras(p, adapters, strengths)
                p = quantize_flux_params(p, mode=resolve_quant_mode(self._quantize))
            p = jax.device_put(p)
        else:
            p = self._swap_base
            if adapters:
                p = merge_loras(p, adapters, strengths)
            # normalize host np leaves (and merged jnp leaves) onto device
            p = jax.tree.map(jnp.asarray, p)
        if self.mesh is not None:
            from conceptattention_tpu.parallel.sharding import shard_params

            p = shard_params(p, self.mesh, self.cfg)
        self.params = p
        self._active_loras = descriptors
        return self.active_loras

    # ------------------------------------------------------------------
    def _attention_spec(self) -> ConceptAttentionSpec:
        return ConceptAttentionSpec(
            taps=("output", "cross_attention"),
            backend=self.attention_backend,
            int8_qk=self.int8_qk,
            # bf16 stash on TPU-like backends only (same split as
            # decode_dtype): halves the resident per-step saliency bytes the
            # sampler scan stacks; CPU tests keep the exact-f32 stash.
            stash_dtype=("bf16" if self.decode_dtype == jnp.bfloat16
                         else None),
            # Ring (sequence-parallel) backends shard the image tokens over
            # the mesh's "seq" axis; other backends take placement from the
            # params' NamedShardings and need no mesh in the (static) spec.
            mesh=self.mesh if self.attention_backend.startswith("ring") else None,
        )

    # ------------------------------------------------------------------
    def _prepare_text(self, prompt: str, batch_size: int = 1,
                      need_clip: bool = True):
        """(txt, txt_ids, vec); `need_clip=False` skips the CLIP forward and
        returns vec=None — the encode/segmentation paths modulate with the
        zeroed concept vector instead (reference raw_output_space.py:195), so
        running the full CLIP text tower there would be pure waste with real
        checkpoints."""
        txt = self.text_encoders.encode_t5([prompt]).astype(self.dtype)
        txt = jnp.broadcast_to(txt, (batch_size, *txt.shape[1:]))
        vec = None
        if need_clip:
            vec = self.text_encoders.encode_clip([prompt]).astype(self.dtype)
            vec = jnp.broadcast_to(vec, (batch_size, *vec.shape[1:]))
        txt_ids = jnp.zeros((batch_size, txt.shape[1], 3), dtype=jnp.float32)
        return txt, txt_ids, vec

    def _prepare_concepts(self, concepts: List[str], batch_size: int = 1):
        c_emb, c_ids, c_vec = embed_concepts(self.text_encoders, concepts, batch_size)
        return c_emb.astype(self.dtype), c_ids, c_vec.astype(self.dtype)

    # ------------------------------------------------------------------
    def generate_image(
        self,
        prompt: str,
        concepts: List[str],
        width: int = 1024,
        height: int = 1024,
        return_cross_attention: bool = False,  # reference parity: the
        # reference asserts this False and returns cross maps regardless
        # (concept_attention_pipeline.py:122,136,153) — we always return them
        layer_indices: Optional[Sequence[int]] = None,
        return_pil_heatmaps: bool = True,
        seed: int = 0,
        num_inference_steps: int = 4,
        guidance: float = 0.0,
        timesteps: Optional[Sequence[int]] = None,
        softmax: bool = True,
        attention_norm: str = "sparsemax",
        cmap: str = "plasma",
        return_image_array: bool = False,
        init_image=None,
        image2image_strength: float = 0.8,
        watermark: bool = True,  # DWT-DCT invisible watermark; the reference
        # embeds it unconditionally (image_generator.py:201) — opt-out here
    ) -> ConceptAttentionPipelineOutput:
        """Generate an image and per-concept heatmaps.

        Defaults mirror the reference (concept_attention_pipeline.py:116-132):
        layers 15..18, all timesteps, softmax normalization. `init_image` +
        `image2image_strength` enable image-to-image (reference
        image_generator.py:121-152: start denoising from a partially-noised
        VAE encoding of the input).

        Normalization precedence (reference quirk, kept for API parity):
        `softmax=True` (the default) OVERRIDES `attention_norm` — pass
        `softmax=False, attention_norm='sparsemax'|'entmax15'` to get the
        sparse norms the paper evaluates.
        """
        depth = self.cfg.depth
        if layer_indices is None:
            layer_indices = list(range(max(0, depth - 4), depth))
        assert all(0 <= i < depth for i in layer_indices), "Invalid layer index"
        # Rectangles are fully supported: the heatmap path is grid-general
        # (reduce_maps(spatial_shape=...), make_img_ids(lh//2, lw//2)) — the
        # reference is square-locked only by its hardcoded 64x64 reshape
        # (concept_attention_pipeline.py:84-90).
        assert height % 16 == 0 and width % 16 == 0, (
            "height/width must be multiples of 16 (VAE 8x + 2x2 packing)")
        if timesteps is None:
            timesteps = list(range(num_inference_steps))

        key = jax.random.PRNGKey(seed)
        noise = get_noise(
            key, 1, height, width, self.dtype,
            channels=self.spec.ae_params.z_channels, vae_factor=self.vae_factor,
        )
        b, _, lh, lw = noise.shape
        schedule = get_schedule(
            num_inference_steps, (lh // 2) * (lw // 2), shift=(not self.is_schnell)
        )

        if init_image is not None:
            # image-to-image: blend forward-noised init latents and shorten
            # the schedule (reference image_generator.py:148-152).
            z0 = self._encode_pixels(init_image, height, width, seed)
            t_idx = int((1.0 - image2image_strength) * num_inference_steps)
            t_idx = max(t_idx, 0)
            if t_idx >= num_inference_steps:
                raise ValueError(
                    f"image2image_strength={image2image_strength} leaves no "
                    "denoise steps (and therefore no concept saliency); use "
                    "strength > 0, or encode_image() for heatmaps of an "
                    "unmodified image"
                )
            t = schedule[t_idx]
            schedule = schedule[t_idx:]
            noise = (t * noise.astype(jnp.float32) + (1.0 - t) * z0.astype(jnp.float32)).astype(noise.dtype)
            if timesteps == list(range(num_inference_steps)):
                timesteps = list(range(len(schedule) - 1))

        txt, txt_ids, vec = self._prepare_text(prompt, b)
        c_emb, c_ids, c_vec = self._prepare_concepts(concepts, b)

        img = pack_latents(noise)
        img_ids = make_img_ids(lh // 2, lw // 2, b)

        latents, saliency = _generate_latents(
            self.params, self.cfg, img, img_ids, txt, txt_ids, vec,
            c_emb, c_ids, c_vec, jnp.asarray(schedule), guidance,
            self._attention_spec(),
            self.cfg.guidance_embed,
        )

        # Heatmaps: [S, L, B, C, P] -> [B, C, h, w]
        grid = (lh // 2, lw // 2)
        concept_heatmaps = reduce_maps(
            saliency["output"], layer_indices, timesteps, softmax, attention_norm, grid
        )
        cross_attention_maps = reduce_maps(
            saliency["cross_attention"], layer_indices, timesteps, softmax,
            attention_norm, grid,
        )

        image = self._decode_to_image(latents, grid, return_image_array)
        if watermark:
            from conceptattention_tpu.utils.watermark import embed_watermark

            arr = embed_watermark(np.asarray(image))
            if return_image_array:
                image = arr
            else:
                import PIL.Image

                image = PIL.Image.fromarray(arr)
        return self._package_output(
            image, concept_heatmaps, cross_attention_maps, return_pil_heatmaps, cmap
        )

    # ------------------------------------------------------------------
    def generate_images(
        self,
        prompts: List[str],
        concepts: List[str],
        width: int = 1024,
        height: int = 1024,
        layer_indices: Optional[Sequence[int]] = None,
        return_pil_heatmaps: bool = True,
        seed: int = 0,
        num_inference_steps: int = 4,
        guidance: float = 0.0,
        timesteps: Optional[Sequence[int]] = None,
        softmax: bool = True,
        attention_norm: str = "sparsemax",
        cmap: str = "plasma",
        return_image_array: bool = False,
        watermark: bool = True,
        seeds: Optional[Sequence[int]] = None,
    ) -> List[ConceptAttentionPipelineOutput]:
        """Batched multi-prompt generation: ONE jitted denoise dispatch for
        the whole prompt batch (the TPU serving path — bench.py measures this
        shape at batch 8; the reference generates one prompt at a time).

        All prompts share the concept set and schedule. Noise: with `seeds`
        (one per prompt), each prompt gets the exact latents
        `generate_image(seed=seeds[i])` would draw — so a request's output is
        independent of which batch it rode in (the property the serving
        micro-batcher relies on). Without `seeds`, one [B, ...] draw from
        `seed` (cheaper, but batch-composition-dependent). Returns one
        `ConceptAttentionPipelineOutput` per prompt, in order.
        """
        b = len(prompts)
        if b == 0:
            return []
        if seeds is not None and len(seeds) != b:
            raise ValueError(f"seeds has {len(seeds)} entries for {b} prompts")
        depth = self.cfg.depth
        if layer_indices is None:
            layer_indices = list(range(max(0, depth - 4), depth))
        assert all(0 <= i < depth for i in layer_indices), "Invalid layer index"
        # Rectangles are fully supported: the heatmap path is grid-general
        # (reduce_maps(spatial_shape=...), make_img_ids(lh//2, lw//2)) — the
        # reference is square-locked only by its hardcoded 64x64 reshape
        # (concept_attention_pipeline.py:84-90).
        assert height % 16 == 0 and width % 16 == 0, (
            "height/width must be multiples of 16 (VAE 8x + 2x2 packing)")
        if timesteps is None:
            timesteps = list(range(num_inference_steps))

        if seeds is None:
            noise = get_noise(
                jax.random.PRNGKey(seed), b, height, width, self.dtype,
                channels=self.spec.ae_params.z_channels, vae_factor=self.vae_factor,
            )
        else:
            noise = jnp.concatenate(
                [
                    get_noise(
                        jax.random.PRNGKey(int(s)), 1, height, width, self.dtype,
                        channels=self.spec.ae_params.z_channels,
                        vae_factor=self.vae_factor,
                    )
                    for s in seeds
                ],
                axis=0,
            )
        _, _, lh, lw = noise.shape
        schedule = get_schedule(
            num_inference_steps, (lh // 2) * (lw // 2), shift=(not self.is_schnell)
        )

        txt = self.text_encoders.encode_t5(list(prompts)).astype(self.dtype)
        vec = self.text_encoders.encode_clip(list(prompts)).astype(self.dtype)
        txt_ids = jnp.zeros((b, txt.shape[1], 3), dtype=jnp.float32)
        c_emb, c_ids, c_vec = self._prepare_concepts(concepts, b)

        img = pack_latents(noise)
        img_ids = make_img_ids(lh // 2, lw // 2, b)

        latents, saliency = _generate_latents(
            self.params, self.cfg, img, img_ids, txt, txt_ids, vec,
            c_emb, c_ids, c_vec, jnp.asarray(schedule), guidance,
            self._attention_spec(),
            self.cfg.guidance_embed,
        )

        grid = (lh // 2, lw // 2)
        concept_heatmaps = reduce_maps(
            saliency["output"], layer_indices, timesteps, softmax, attention_norm, grid
        )
        cross_attention_maps = reduce_maps(
            saliency["cross_attention"], layer_indices, timesteps, softmax,
            attention_norm, grid,
        )

        # Dispatch every decode BEFORE fetching any result: np.asarray is the
        # only sync point on this backend, so the old dispatch->fetch->
        # dispatch loop serialized 30-90 ms of tunnel overhead per image;
        # issuing all dispatches first overlaps that overhead (and the host
        # conversion of image i) with the device still decoding i+1.
        pixel_futs = [
            _vae_decode(self.ae_params, self.spec.ae_params,
                        latents[i : i + 1], grid[0], grid[1],
                        dtype=self.decode_dtype)
            for i in range(b)
        ]
        arrs = [self._pixels_to_uint8(p[0]) for p in pixel_futs]

        outputs = []
        for i in range(b):
            if return_image_array:
                image = arrs[i]
            else:
                import PIL.Image

                image = PIL.Image.fromarray(arrs[i])
            if watermark:
                from conceptattention_tpu.utils.watermark import embed_watermark

                arr = embed_watermark(np.asarray(image))
                if return_image_array:
                    image = arr
                else:
                    import PIL.Image

                    image = PIL.Image.fromarray(arr)
            outputs.append(
                self._package_output(
                    image,
                    concept_heatmaps[i : i + 1],
                    cross_attention_maps[i : i + 1],
                    return_pil_heatmaps,
                    cmap,
                )
            )
        return outputs

    # ------------------------------------------------------------------
    def encode_image(
        self,
        image,
        concepts: List[str],
        prompt: str = "",
        width: int = 1024,
        height: int = 1024,
        layer_indices: Optional[Sequence[int]] = None,
        num_samples: int = 1,
        num_steps: int = 4,
        noise_timestep: int = 2,
        return_pil_heatmaps: bool = True,
        seed: int = 0,
        cmap: str = "plasma",
        stop_after_multi_modal_attentions: bool = True,
        attention_norm: str = "sparsemax",
        softmax: bool = True,
        device: Optional[str] = None,  # API parity
    ) -> ConceptAttentionPipelineOutput:
        """Concept heatmaps for a *real* image: VAE-encode, forward-noise to
        `noise_timestep`, one DiT forward stopping after the double blocks
        (reference concept_attention_pipeline.py:204-357).

        As in `generate_image`, `softmax=True` (default) overrides
        `attention_norm`; pass `softmax=False` to use the sparse norms.
        """
        depth = self.cfg.depth
        if layer_indices is None:
            layer_indices = list(range(max(0, depth - 4), depth))
        assert all(0 <= i < depth for i in layer_indices), "Invalid layer index"
        # Rectangles are fully supported: the heatmap path is grid-general
        # (reduce_maps(spatial_shape=...), make_img_ids(lh//2, lw//2)) — the
        # reference is square-locked only by its hardcoded 64x64 reshape
        # (concept_attention_pipeline.py:84-90).
        assert height % 16 == 0 and width % 16 == 0, (
            "height/width must be multiples of 16 (VAE 8x + 2x2 packing)")

        z = self._encode_pixels(image, height, width, seed)

        txt, txt_ids, _ = self._prepare_text(prompt, 1, need_clip=False)
        c_emb, c_ids, c_vec = self._prepare_concepts(concepts, 1)

        b, _, lh, lw = z.shape
        img_ids = make_img_ids(lh // 2, lw // 2, b)
        schedule = get_schedule(
            num_steps, (lh // 2) * (lw // 2), shift=(not self.is_schnell)
        )
        t = schedule[noise_timestep]

        # The encode protocol modulates BOTH streams with the zeroed concept
        # CLIP vector (y=inp["concept_vec"], reference
        # concept_attention_pipeline.py:293 and raw_output_space.py:195) —
        # not clip(prompt) as in generation. Mask-level parity depends on it
        # (tests/test_seg_protocol_parity.py).
        saliency = batched_noise_saliency(
            self, z, t, num_samples, height, width, seed,
            txt, txt_ids, c_vec, c_emb, c_ids, c_vec,
            self._attention_spec(),
            stop_after=stop_after_multi_modal_attentions,
        )

        grid = (lh // 2, lw // 2)
        concept_heatmaps = reduce_maps(
            saliency["output"], layer_indices, None, softmax, attention_norm, grid
        )
        cross_attention_maps = reduce_maps(
            saliency["cross_attention"], layer_indices, None, softmax,
            attention_norm, grid,
        )
        return self._package_output(
            image, concept_heatmaps, cross_attention_maps, return_pil_heatmaps, cmap
        )

    # ------------------------------------------------------------------
    def encode_images(
        self,
        images,
        concepts,
        prompts=None,
        width: int = 1024,
        height: int = 1024,
        layer_indices: Optional[Sequence[int]] = None,
        num_samples: int = 1,
        num_steps: int = 4,
        noise_timestep: int = 2,
        return_pil_heatmaps: bool = True,
        seeds=None,
        cmap: str = "plasma",
        stop_after_multi_modal_attentions: bool = True,
        attention_norm: str = "sparsemax",
        softmax: bool = True,
    ) -> List[ConceptAttentionPipelineOutput]:
        """`encode_image` for B real images in ONE batched VAE encode +
        stopped forward — the served `/v1/encode` coalescing path (cross-
        request batching drops the per-image marginal cost ~2.9×, `bench.py
        --encode`).

        `concepts` is one shared list or a per-image list of lists (lengths
        must match — the server guarantees it via the batch key); `prompts`
        one string or a per-image list; `seeds` one int or per-image.
        Output-identical to B sequential `encode_image` calls
        (tests/test_seg_batch.py::TestEncodeImages): per-image noise keys
        and per-image VAE reparameterization draws match what each image
        would draw alone."""
        B = len(images)
        assert B >= 1
        if concepts and isinstance(concepts[0], str):
            concepts_list = [list(concepts)] * B
        else:
            concepts_list = [list(c) for c in concepts]
            assert len(concepts_list) == B
        C = len(concepts_list[0])
        assert all(len(c) == C for c in concepts_list), (
            "per-image concept lists must share a length in one batch"
        )
        if prompts is None:
            prompts = [""] * B
        elif isinstance(prompts, str):
            prompts = [prompts] * B
        assert len(prompts) == B
        seeds = _seeds_list(0 if seeds is None else seeds, B)

        depth = self.cfg.depth
        if layer_indices is None:
            layer_indices = list(range(max(0, depth - 4), depth))
        assert all(0 <= i < depth for i in layer_indices), "Invalid layer index"
        assert height % 16 == 0 and width % 16 == 0, (
            "height/width must be multiples of 16 (VAE 8x + 2x2 packing)")

        zs = self._encode_pixels_batch(images, height, width, seeds)
        _, _, lh, lw = zs.shape
        schedule = get_schedule(
            num_steps, (lh // 2) * (lw // 2), shift=(not self.is_schnell)
        )
        t = schedule[noise_timestep]

        txts = self.text_encoders.encode_t5(list(prompts)).astype(self.dtype)
        txt_ids = jnp.zeros((B, txts.shape[1], 3), dtype=jnp.float32)
        per_image = [self._prepare_concepts(c, 1) for c in concepts_list]
        c_embs = jnp.concatenate([e for e, _, _ in per_image], axis=0)
        c_ids = jnp.concatenate([i for _, i, _ in per_image], axis=0)
        c_vecs = jnp.concatenate([v for _, _, v in per_image], axis=0)

        # y = the zeroed concept CLIP vector, as in encode_image (reference
        # raw_output_space.py:195).
        saliency = batched_images_saliency(
            self, zs, t, num_samples, height, width, seeds,
            txts, txt_ids, c_vecs, c_embs, c_ids, c_vecs,
            self._attention_spec(),
            stop_after=stop_after_multi_modal_attentions,
        )

        grid = (lh // 2, lw // 2)
        outputs = []
        for b in range(B):
            # [N, L, C, P] -> the [N, L, 1, C, P] layout reduce_maps expects
            sal_b = jax.tree.map(lambda a: a[b][:, :, None], saliency)
            outputs.append(self._package_output(
                images[b],
                reduce_maps(sal_b["output"], layer_indices, None, softmax,
                            attention_norm, grid),
                reduce_maps(sal_b["cross_attention"], layer_indices, None,
                            softmax, attention_norm, grid),
                return_pil_heatmaps, cmap,
            ))
        return outputs

    # ------------------------------------------------------------------
    def _encode_pixels(self, image, height: int, width: int, seed: int,
                       sample: bool = True) -> jax.Array:
        """PIL/array -> [1, 3, H, W] in [-1, 1] -> VAE latents [1, 16, H/8, W/8].

        `sample=False` returns the posterior MEAN (no reparameterization
        draw) — the deterministic-eval mode parity tests use (the reference's
        DiagonalGaussian(sample=...) switch, flux modules/autoencoder.py:262-274).
        """
        # Shared dtype-branching scaler (utils/images.py): integer inputs are
        # byte-valued, floats are trusted as [0, 1] — no value-range heuristic.
        arr = 2.0 * as_float01_chw(image) - 1.0
        x = jnp.asarray(arr)[None]
        x = jax.image.resize(x, (1, 3, height, width), method="bilinear")
        # Encoder stays NCHW: measured 3x faster than NHWC on TPU at 1024^2
        # (the 3-channel input conv dominates and is hostile to channel-last;
        # the decoder is the opposite case — see _vae_decode_f32).
        # fold_in: the VAE reparameterization draw must be independent of the
        # diffusion-noise draws, which use PRNGKey(seed [+ i]) directly — a
        # bare PRNGKey(seed) here would make sample 0's forward noise
        # bit-identical to the VAE noise (same shape), correlating them.
        vae_keys = (jax.random.fold_in(jax.random.PRNGKey(seed), 0x7AE)[None]
                    if sample else None)
        return _vae_encode(
            self.ae_params, self.spec.ae_params, x, vae_keys, sample=sample
        ).astype(self.dtype)

    def _encode_pixels_batch(self, images, height: int, width: int,
                             seed, sample: bool = True) -> jax.Array:
        """B images -> [B, 16, H/8, W/8] latents. `seed` is one int (eval
        harness: every image draws the VAE noise its own `_encode_pixels`
        call would — same key) or a per-image sequence (coalesced serving
        requests). Bit-comparable with B per-image `_encode_pixels` calls
        either way (see `_vae_encode`).

        On TPU-like backends the encoder runs per-image (chunk 1): the
        1024² encoder's first-stage activations at B≥2 measured
        RESOURCE_EXHAUSTED next to the resident d19 DiT (round-5 `bench.py
        --encode` ladder), and at 73 ms/image the encoder is <15% of the
        eval cost — the ~3× batching win lives in the stopped forward,
        which stays fully batched. CPU (tests) keeps one batched forward."""
        seeds = _seeds_list(seed, len(images))
        chunk = 1 if self.decode_dtype == jnp.bfloat16 else len(images)
        outs = []
        for lo in range(0, len(images), chunk):
            group = images[lo:lo + chunk]
            x = jnp.concatenate(
                [
                    jax.image.resize(
                        jnp.asarray(2.0 * as_float01_chw(im) - 1.0)[None],
                        (1, 3, height, width), method="bilinear",
                    )
                    for im in group
                ],
                axis=0,
            )
            vae_keys = (
                jnp.stack([
                    jax.random.fold_in(jax.random.PRNGKey(s), 0x7AE)
                    for s in seeds[lo:lo + chunk]
                ])
                if sample else None
            )
            outs.append(_vae_encode(
                self.ae_params, self.spec.ae_params, x, vae_keys,
                sample=sample,
            ))
        return jnp.concatenate(outs, axis=0).astype(self.dtype)

    @staticmethod
    def _pixels_to_uint8(p) -> np.ndarray:
        """[3, H, W] decode output -> HWC uint8. ONE conversion shared by
        the single-image and batched paths so they can never diverge; the
        f32 upcast keeps the 0..255 mapping exact when the decode ran bf16."""
        x = jnp.clip(p.astype(jnp.float32), -1.0, 1.0)
        return np.asarray(((x + 1.0) * 127.5).transpose(1, 2, 0)).astype(np.uint8)

    def _decode_to_image(self, latents, grid, return_array: bool):
        x = _vae_decode(self.ae_params, self.spec.ae_params, latents,
                        grid[0], grid[1], dtype=self.decode_dtype)
        arr = self._pixels_to_uint8(x[0])
        if return_array:
            return arr
        import PIL.Image

        return PIL.Image.fromarray(arr)

    def _package_output(
        self, image, concept_heatmaps, cross_attention_maps, return_pil: bool, cmap: str
    ) -> ConceptAttentionPipelineOutput:
        concept_heatmaps = np.asarray(concept_heatmaps, dtype=np.float32)[0]
        cross_attention_maps = np.asarray(cross_attention_maps, dtype=np.float32)[0]
        if return_pil:
            concept_heatmaps = heatmaps_to_pil(concept_heatmaps, cmap)
            cross_attention_maps = heatmaps_to_pil(cross_attention_maps, cmap)
        return ConceptAttentionPipelineOutput(
            image=image,
            concept_heatmaps=concept_heatmaps,
            cross_attention_maps=cross_attention_maps,
        )
