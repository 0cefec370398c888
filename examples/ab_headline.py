"""Interleaved A/B of the round-4 flash-kernel changes at the headline config.

Round-4's committed capture regressed vs round-3 (0.5792 vs 0.6138 img/s)
in a round whose kernel changes (pinned K-stream d11d047, 768x1536 doubles
tiles 4671232) each measured FASTER standalone. This script settles whether
the delta is a code effect or tunnel/session drift, the only way that is
valid on this backend: both variants compiled in ONE process and timed in
strict alternation (A B A B ...), so any environmental drift hits both
equally.

  variant r04: pin_k_stream=True,  S=4608 tiles (768, 1536)   (HEAD)
  variant r03: pin_k_stream=False, S=4608 tiles (576, 1536)   (round-3 kernel)

Everything else (d19/38 w8a8 b8 4-step denoise + per-image VAE decode,
deferred-fetch timing) is bench.py's attempt() verbatim.

Usage:  python examples/ab_headline.py [--rounds 3] [--iters 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS"):
    from conceptattention_tpu import resolve_jax_platforms

    jax.config.update(
        "jax_platforms", resolve_jax_platforms(os.environ["JAX_PLATFORMS"])
    )
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument(
        "--variants", default="r04:1:768:1536,r03:0:576:1536",
        help="comma-separated name:pin:block_q4608:block_k4608 entries",
    )
    args = ap.parse_args()

    from conceptattention_tpu.config import AutoEncoderConfig, FluxConfig
    from conceptattention_tpu.kernels import flash_saliency
    from conceptattention_tpu.models.flux import autoencoder as vae
    from conceptattention_tpu.ops.attention import ConceptAttentionSpec
    from conceptattention_tpu.ops.packing import make_img_ids, unpack_latents
    from conceptattention_tpu.ops.quant import (
        init_flux_params_quantized,
        resolve_quant_mode,
    )
    from conceptattention_tpu.ops.schedule import get_schedule
    from conceptattention_tpu.sampling.rectified_flow import denoise

    cfg = FluxConfig(depth=19, depth_single_blocks=38, guidance_embed=False)
    dtype = jnp.bfloat16
    b, t, c = args.batch, 256, 4
    grid = (64, 64)
    p_tokens = grid[0] * grid[1]

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 6)
    params = init_flux_params_quantized(
        keys[0], cfg, dtype, mode=resolve_quant_mode("w8a8")
    )
    img = jax.random.normal(keys[1], (b, p_tokens, cfg.in_channels), dtype)
    img_ids = make_img_ids(*grid, batch_size=b)
    txt = jax.random.normal(keys[2], (b, t, cfg.context_in_dim), dtype)
    txt_ids = jnp.zeros((b, t, 3), jnp.float32)
    y = jax.random.normal(keys[3], (b, cfg.vec_in_dim), dtype)
    concepts = jax.random.normal(keys[4], (b, c, cfg.context_in_dim), dtype)
    concept_ids = jnp.zeros((b, c, 3), jnp.float32)
    concept_vec = jnp.zeros((b, cfg.vec_in_dim), dtype)
    schedule = jnp.asarray(get_schedule(4, p_tokens, shift=False))
    ae_cfg = AutoEncoderConfig()
    ae_params = vae.init_autoencoder_params(keys[5], ae_cfg, dtype)

    spec = ConceptAttentionSpec(taps=("output", "cross_attention"),
                                backend="pallas")

    def run_impl(params, img):
        out, sal = denoise(
            params, cfg,
            img=img, img_ids=img_ids, txt=txt, txt_ids=txt_ids, vec=y,
            timesteps=schedule, guidance=0.0,
            concepts=concepts, concept_ids=concept_ids,
            concept_vec=concept_vec, spec=spec,
        )
        chk = jnp.sum(out.astype(jnp.float32)) + sal["output"].mean()
        return chk, out

    @jax.jit
    def run_decode(ae_params, out):
        z = unpack_latents(out, *grid)
        pixels = jax.lax.map(
            lambda zi: vae.decode_nhwc(ae_params, ae_cfg, zi[None])[0], z
        )
        return jnp.sum(pixels.astype(jnp.float32))

    VARIANTS = {}
    for ent in args.variants.split(","):
        name, pin, bq, bk = ent.split(":")
        VARIANTS[name] = (pin == "1", (int(bq), int(bk)))
    runs = {}
    for name, (pin, tiles) in VARIANTS.items():
        # The knobs are read at TRACE time of a fresh jit object per variant
        # (pin rides through as a static arg of the inner kernel jit, so the
        # two variants can never silently share a compiled kernel).
        flash_saliency._PIN_K_STREAM = pin
        flash_saliency._TUNED_TILES[4608] = tiles
        f = jax.jit(run_impl)
        t0 = time.perf_counter()
        chk, out = f(params, img)
        float(chk)
        print(f"# {name}: compiled+warmed in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)
        runs[name] = f
    float(run_decode(ae_params, out))  # warm decode once (shared)

    def timed(f, iters):
        t0 = time.perf_counter()
        chks = []
        for i in range(iters):
            chk, out = f(params, img * (1.0 + i / 64.0))
            chks.append(chk)
            chks.append(run_decode(ae_params, out))
        for c_ in chks:
            float(c_)
        return (time.perf_counter() - t0) / iters

    results = {k: [] for k in VARIANTS}
    order = list(VARIANTS)
    for r in range(args.rounds):
        for name in order:
            dt = timed(runs[name], args.iters)
            results[name].append(b / dt)
            print(f"round {r} {name}: {b / dt:.4f} img/s ({dt:.2f} s/iter)",
                  flush=True)
        order.reverse()  # ABBA ordering cancels linear drift within a round

    print("\nsummary (img/s):")
    for name, xs in results.items():
        mean = sum(xs) / len(xs)
        print(f"  {name}: mean {mean:.4f}  min {min(xs):.4f}  "
              f"max {max(xs):.4f}  n={len(xs)}")


if __name__ == "__main__":
    main()
