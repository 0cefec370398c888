"""On-chip rate probe for the d=64 head-pair-packed kernel (video shape).

Measures TFLOP/s at the CogVideoX fused length (S=18032, 48 heads, d=64,
b1) for: the unpaired kernel (round-4 baseline 58.4), the unpaired int8-QK
re-race the round-4 verdict asked for, and the paired kernel across tile
candidates. Same in-jit loop_rate primitive as bench.py's phase probes.

    python examples/probe_paired.py [--seq 18032] [--iters 4]
"""

import argparse
import os
import sys

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
    ap.add_argument("--seq", type=int, default=18032)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--heads", type=int, default=48)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    from conceptattention_tpu.kernels.flash_saliency import (
        _auto_tiles,
        expand_rope_tables,
        fused_concept_flash_attention,
        fused_concept_flash_attention_paired,
    )
    from conceptattention_tpu.utils.profiling import loop_rate

    b, h, s, d = args.batch, args.heads, args.seq, 64
    key = jax.random.PRNGKey(7)
    kq, kk, kv, ka = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
    ang = jax.random.uniform(ka, (b, s, d // 2), jnp.float32, 0, 6.28)
    rc, rs = expand_rope_tables(
        [(jnp.cos(ang)[:, None], jnp.sin(ang)[:, None])], s)
    ops = 4 * s * s * d * h * b

    def rate_unpaired(int8=False):
        bq, bk = _auto_tiles(s)

        def attn(q, k, v):
            return fused_concept_flash_attention(
                q, k, v, txt_len=s, img_len=0, concept_len=0,
                block_q=bq, block_k=bk, rope_cos=rc, rope_sin=rs,
                int8_qk=int8)
        return ops / loop_rate(attn, q, k, v, iters=args.iters)

    def rate_paired(bq, bk):
        def attn(q, k, v):
            return fused_concept_flash_attention_paired(
                q, k, v, rc, rs, txt_len=s, img_len=0, concept_len=0,
                block_q=bq, block_k=bk)
        return ops / loop_rate(attn, q, k, v, iters=args.iters)

    for name, fn in [("unpaired", lambda: rate_unpaired(False)),
                     ("unpaired+int8qk", lambda: rate_unpaired(True))]:
        try:
            print(f"{name}: {fn() / 1e12:.1f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    candidates = [(512, 768), (768, 768), (512, 512), (256, 768),
                  (768, 512), (384, 768), (512, 1024), (640, 768)]
    best = None
    for bq, bk in candidates:
        try:
            r = rate_paired(bq, bk)
            print(f"paired {bq}x{bk}: {r / 1e12:.1f} TFLOP/s", flush=True)
            if best is None or r > best[0]:
                best = (r, bq, bk)
        except Exception as e:
            print(f"paired {bq}x{bk}: FAILED {type(e).__name__}: {e}",
                  flush=True)
    if best:
        print(f"BEST paired: {best[1]}x{best[2]} at {best[0] / 1e12:.1f} "
              f"TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
