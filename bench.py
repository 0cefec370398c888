"""Headline benchmark: flux-schnell generation + concept heatmaps.

Measures images/sec for a 4-step 1024x1024 rectified-flow generation with
4-concept saliency extraction (the BASELINE.json north-star config), plus the
heatmap-extraction overhead vs. a plain generation pass.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: BASELINE.json targets >= 1x A100 images/sec for the full 12B
flux-schnell. An A100 runs full flux-schnell 4-step 1024^2 at ~0.5 img/s
(~2 s/image, common public measurements; the reference repo publishes no
numbers — BASELINE.md). Config ladder (first that fits the chip wins):
  1. full d19/38 with weight-only int8 (true architecture; ~12 GB on a
     16 GB v5e),
  2. depth-scaled bf16, throughput normalized to full-depth FLOP-equivalents.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

A100_FULL_FLUX_IMGS_PER_SEC = 0.5  # full 12B flux-schnell, 4-step 1024^2
FULL_DEPTH = (19, 38)


def hbm_limit() -> float:
    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats()
        if stats and stats.get("bytes_limit"):
            return float(stats["bytes_limit"])
    except Exception:
        pass
    return 16e9  # v5e default; memory_stats absent under the axon plugin


def attempt(depth: int, depth_single: int, quantize: bool, backends, batch: int = 1):
    from conceptattention_tpu.config import AutoEncoderConfig, FluxConfig
    from conceptattention_tpu.models.flux import autoencoder as vae
    from conceptattention_tpu.models.flux.params import init_flux_params
    from conceptattention_tpu.ops.attention import ConceptAttentionSpec
    from conceptattention_tpu.ops.packing import make_img_ids, unpack_latents
    from conceptattention_tpu.ops.schedule import get_schedule
    from conceptattention_tpu.sampling.rectified_flow import denoise

    cfg = FluxConfig(depth=depth, depth_single_blocks=depth_single, guidance_embed=False)
    dtype = jnp.bfloat16
    b, t, c = batch, 256, 4
    grid = (64, 64)  # 1024x1024 pixels -> 4096 image tokens
    p_tokens = grid[0] * grid[1]

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 6)
    if quantize:  # "w8" (weight-only) or "w8a8" (int8 activations too)
        from conceptattention_tpu.ops.quant import init_flux_params_quantized

        params = init_flux_params_quantized(
            keys[0], cfg, dtype, act_quant=(quantize == "w8a8")
        )
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
    schedule = jnp.asarray(get_schedule(4, p_tokens, shift=False))
    # VAE decode is part of the measured path (an A100 "full flux-schnell"
    # img/s number includes it). Decoded per-image under lax.map to bound the
    # 1024^2 conv activations next to the 12 GB of DiT weights.
    ae_cfg = AutoEncoderConfig()
    ae_params = vae.init_autoencoder_params(keys[5], ae_cfg, dtype)

    import functools

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
        # Scalar checksum: fetching it to host forces the full computation.
        # (On the axon backend block_until_ready does NOT synchronize device
        # compute — only a host fetch does.)
        chk = jnp.sum(out.astype(jnp.float32))
        if with_concepts:
            chk = chk + sal["output"].mean()
        return chk, out

    # Decode as its own dispatch: folding the 1024^2 conv stack into the
    # 12 GB denoise graph measurably degrades both (memory-pressure
    # scheduling); two back-to-back device graphs carry no such penalty.
    @jax.jit
    def run_decode(ae_params, out):
        z = unpack_latents(out, *grid)
        pixels = jax.lax.map(
            lambda zi: vae.decode_nhwc(ae_params, ae_cfg, zi[None])[0], z
        )
        return jnp.sum(pixels.astype(jnp.float32))

    def timed(with_concepts, backend, iters=6):
        # 6 iters: the heatmap-overhead number is the RATIO of two separately
        # timed loops; at 4 iters its run-to-run spread was 0-6%.
        chk, out = run(params, img, with_concepts, backend)  # compile + warm
        float(chk)
        float(run_decode(ae_params, out))
        t0 = time.perf_counter()
        chks = []
        for i in range(iters):
            # Perturbation must survive bf16 rounding (1 + 1e-4 rounds to
            # exactly 1.0 at bf16's 2^-7 spacing, making iterations
            # bit-identical); 1 + i/64 steps are exactly representable.
            chk, out = run(params, img * (1.0 + i / 64.0), with_concepts, backend)
            chks.append(chk)
            chks.append(run_decode(ae_params, out))
        for c in chks:  # deferred fetch: throughput semantics, true sync
            float(c)
        return (time.perf_counter() - t0) / iters

    results = {}
    for backend in backends:
        try:
            results[backend] = timed(True, backend)
        except Exception as e:
            print(f"# backend {backend} failed: {type(e).__name__}", file=sys.stderr)
    if not results:
        raise RuntimeError("all backends failed")
    backend = min(results, key=results.get)
    t_with = results[backend]
    t_plain = timed(False, backend)
    overhead = max(0.0, 100.0 * (t_with - t_plain) / t_plain)
    return b / t_with, overhead, backend


def main():
    hbm = hbm_limit()
    if hbm >= 26e9:
        ladder = [(19, 38, False, ("xla", "pallas"), 1)]
    else:
        # int8 full depth first (XLA attention's materialized logits don't fit
        # alongside the weights -> flash kernel only), then depth-scaled bf16.
        n = max(1, int(hbm * 0.5 / 1.25e9))
        ladder = [
            (19, 38, "w8a8", ("pallas",), 8),  # full arch, int8 MXU serving
            (19, 38, "w8a8", ("pallas",), 4),
            (19, 38, "w8", ("pallas",), 4),    # full arch, int8 weights only
            (19, 38, "w8", ("pallas",), 1),    # full arch, int8, single image
            (min(19, n), min(38, 2 * n), False, ("xla", "pallas"), 1),
        ]

    for depth, depth_single, quantize, backends, batch in ladder:
        try:
            try:
                imgs_per_sec, overhead_pct, backend = attempt(
                    depth, depth_single, quantize, backends, batch
                )
            except Exception as first:
                # The remote-compile relay occasionally 500s transiently;
                # one retry before falling down the ladder.
                print(f"# retrying after {type(first).__name__}", file=sys.stderr)
                first.__traceback__ = None
                del first
                import gc as _gc

                _gc.collect()
                imgs_per_sec, overhead_pct, backend = attempt(
                    depth, depth_single, quantize, backends, batch
                )
        except Exception as e:
            import gc
            import traceback

            traceback.print_exc(limit=3, file=sys.stderr)
            print(f"# config d{depth}/{depth_single} q={quantize} b{batch} failed: "
                  f"{type(e).__name__}", file=sys.stderr)
            # Drop the traceback: its frames pin the attempt's 12 GB of
            # device buffers, OOMing every later ladder entry.
            e.__traceback__ = None
            del e
            gc.collect()
            continue
        flop_scale = (depth + 0.5 * depth_single) / (FULL_DEPTH[0] + 0.5 * FULL_DEPTH[1])
        full_equiv = imgs_per_sec * flop_scale
        vs_baseline = full_equiv / A100_FULL_FLUX_IMGS_PER_SEC
        print(json.dumps({
            "metric": (
                f"images/sec flux-schnell-d{depth}/{depth_single} 1024px 4-step b{batch} "
                f"4-concept heatmaps + VAE decode, "
                f"{'int8-w8a8' if quantize == 'w8a8' else ('int8-weights' if quantize else 'bf16')}, "
                f"1 chip, attn={backend} "
                f"(full-depth-equiv {full_equiv:.3f} img/s, "
                f"heatmap overhead {overhead_pct:.1f}%)"
            ),
            "value": round(imgs_per_sec, 4),
            "unit": "images/sec",
            "vs_baseline": round(vs_baseline, 3),
        }))
        return
    raise SystemExit("no benchmark configuration fit the device")


if __name__ == "__main__":
    main()
