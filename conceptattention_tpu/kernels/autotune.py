"""On-device tile autotuner for the fused flash-saliency kernel.

The kernel's `_BEST_TILES` table (flash_saliency.py) was hand-measured on
this host's v5e; other TPU generations (v4/v5p/v6e have different VMEM sizes
and MXU/VPU ratios) want different (block_q, block_k). This module sweeps
candidate tiles with the in-jit `loop_rate` primitive (per-dispatch overhead
through a tunnel makes separately-dispatched timing meaningless — see
utils/profiling.py) and persists winners in a per-device-kind JSON cache that
`_auto_tiles` consults before its baked table.

Caveat the candidates are bounded for: an ISOLATED kernel microbench can
mislead at extreme tile sizes — full-row K tiles measured 8-11% faster alone
but 0.92x in the full model (their ~60 MB scoped VMEM starves the rest of the
graph; flash_saliency._BEST_TILES comment). The default candidate set caps
bq*bk at the same VMEM budget the production tiles respect, the regime where
kernel-level ranking has matched model-level ranking on this hardware.

CLI:
    python -m conceptattention_tpu.kernels.autotune --seq 4608 4352 \
        --batch 8 --heads 24 --head_dim 128
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

# VMEM element budget per (bq, bk) tile pair — matches _auto_tiles' bound.
DEFAULT_TILE_ELEM_BUDGET = 1_200_000

_DEFAULT_CACHE = os.path.join(
    os.path.expanduser(os.environ.get("XDG_CACHE_HOME", "~/.cache")),
    "conceptattention_tpu",
    "tiles.json",
)


def default_cache_path() -> str:
    return _DEFAULT_CACHE


def _device_kind() -> str:
    import jax

    d = jax.devices()[0]
    return f"{d.platform}:{getattr(d, 'device_kind', 'unknown')}"


def candidate_tiles(
    s: int,
    budget: int = DEFAULT_TILE_ELEM_BUDGET,
    max_candidates: int = 12,
) -> List[Tuple[int, int]]:
    """Candidate (block_q, block_k) pairs for sequence length s: MXU-friendly
    multiples, exact divisors of s preferred (masked-tail tiles waste pad
    work — 512/1024 on S=4352 pads ~24%), all within the VMEM budget."""
    bqs = [x for x in range(256, 769, 32) if x <= s]
    bks = [x for x in range(512, 2305, 128) if x <= s]
    pairs = []
    for bq in bqs:
        for bk in bks:
            if bq * bk > budget:
                continue
            exact = (s % bq == 0) and (s % bk == 0)
            pairs.append((not exact, -(bq * bk), bq, bk))
    pairs.sort()
    out, seen = [], set()
    for _, _, bq, bk in pairs:
        if (bq, bk) not in seen:
            seen.add((bq, bk))
            out.append((bq, bk))
        if len(out) >= max_candidates:
            break
    if not out:  # tiny sequences (tests, small grids): single full tile
        out = [(min(s, 256), min(s, 256))]
    return out


def measure_tile(
    s: int,
    block_q: int,
    block_k: int,
    batch: int = 8,
    heads: int = 24,
    head_dim: int = 128,
    iters: int = 4,
    int8_qk: bool = False,
    interpret: bool = False,
    with_rope: bool = True,
) -> float:
    """Measured TFLOP/s of one fused-attention call at these tiles (the same
    probe shape bench.py's phase split uses: pure self-attention, fused RoPE
    so the production code path is exercised)."""
    import jax
    import jax.numpy as jnp

    from conceptattention_tpu.kernels.flash_saliency import (
        expand_rope_tables,
        fused_concept_flash_attention,
    )
    from conceptattention_tpu.utils.profiling import loop_rate

    key = jax.random.PRNGKey(42)
    kq, kk, kv, ka = jax.random.split(key, 4)
    q = jax.random.normal(kq, (batch, heads, s, head_dim), jnp.bfloat16)
    k = jax.random.normal(kk, (batch, heads, s, head_dim), jnp.bfloat16)
    v = jax.random.normal(kv, (batch, heads, s, head_dim), jnp.bfloat16)
    rope_cos = rope_sin = None
    if with_rope:
        ang = jax.random.uniform(ka, (batch, s, head_dim // 2), jnp.float32, 0, 6.28)
        rope_cos, rope_sin = expand_rope_tables(
            [(jnp.cos(ang)[:, None], jnp.sin(ang)[:, None])], s
        )

    def attn(q, k, v):
        return fused_concept_flash_attention(
            q, k, v,
            txt_len=s, img_len=0, concept_len=0,
            block_q=block_q, block_k=block_k,
            rope_cos=rope_cos, rope_sin=rope_sin,
            int8_qk=int8_qk, interpret=interpret,
        )

    dt = loop_rate(attn, q, k, v, iters=iters)
    ops = 4 * s * s * head_dim * heads * batch  # qk + av, 2 ops per MAC
    return ops / dt / 1e12


def autotune_tiles(
    seq_len: int,
    batch: int = 8,
    heads: int = 24,
    head_dim: int = 128,
    candidates: Optional[Sequence[Tuple[int, int]]] = None,
    iters: int = 4,
    cache_path: Optional[str] = None,
    interpret: bool = False,
    verbose: bool = False,
) -> Tuple[int, int]:
    """Sweep candidates on the current device, register + persist the winner.

    Returns the winning (block_q, block_k); subsequent `_auto_tiles(seq_len)`
    calls (and therefore every model forward) use it. Failures of individual
    candidates (VMEM OOM on smaller chips) are skipped, not fatal.
    """
    cands = list(candidates) if candidates is not None else candidate_tiles(seq_len)
    rates: Dict[Tuple[int, int], float] = {}
    for bq, bk in cands:
        try:
            rate = measure_tile(
                seq_len, bq, bk, batch, heads, head_dim,
                iters=iters, interpret=interpret,
            )
        except Exception as e:  # noqa: BLE001 — candidate infeasible on this chip
            if verbose:
                print(f"  {bq}x{bk}: failed ({type(e).__name__})")
            continue
        rates[(bq, bk)] = rate
        if verbose:
            print(f"  {bq}x{bk}: {rate:.1f} TFLOP/s")
    if not rates:
        raise RuntimeError(f"no feasible tile candidate for S={seq_len}")
    best = max(rates, key=rates.get)
    register_tuned_tiles(seq_len, best)
    _save_cache_entry(seq_len, best, rates[best], batch, heads, head_dim,
                      cache_path or _DEFAULT_CACHE)
    return best


def register_tuned_tiles(seq_len: int, tiles: Tuple[int, int]) -> None:
    """Runtime overlay: takes precedence over the baked _BEST_TILES table."""
    from conceptattention_tpu.kernels import flash_saliency

    flash_saliency._TUNED_TILES[int(seq_len)] = (int(tiles[0]), int(tiles[1]))


def _save_cache_entry(seq_len, tiles, rate, batch, heads, head_dim, path) -> None:
    data = {}
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        pass
    kind = _device_kind()
    data.setdefault(kind, {})[str(int(seq_len))] = {
        "block_q": int(tiles[0]),
        "block_k": int(tiles[1]),
        "tflops": round(float(rate), 2),
        "probe": {"batch": batch, "heads": heads, "head_dim": head_dim},
    }
    parent = os.path.dirname(path)
    if parent:  # bare filenames have no directory to create
        os.makedirs(parent, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1)
    os.replace(tmp, path)


def load_tile_cache(path: Optional[str] = None) -> Dict[int, Tuple[int, int]]:
    """Populate the runtime overlay from the persisted cache for THIS device
    kind. Called lazily by `_auto_tiles` on first use; safe when absent."""
    path = path or _DEFAULT_CACHE
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    entries = data.get(_device_kind(), {})
    loaded = {}
    for s, ent in entries.items():
        try:
            loaded[int(s)] = (int(ent["block_q"]), int(ent["block_k"]))
        except (KeyError, TypeError, ValueError):
            continue
    for s, tiles in loaded.items():
        register_tuned_tiles(s, tiles)
    return loaded


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        prog="conceptattention_tpu.kernels.autotune",
        description="Sweep flash-kernel tile sizes on the current device",
    )
    p.add_argument("--seq", type=int, nargs="+", required=True,
                   help="sequence lengths to tune (flux 1024^2: 4352 singles, 4608 doubles)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--heads", type=int, default=24)
    p.add_argument("--head_dim", type=int, default=128)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--cache_path", default=None)
    args = p.parse_args(argv)

    for s in args.seq:
        print(f"S={s}: sweeping {len(candidate_tiles(s))} candidates")
        best = autotune_tiles(
            s, args.batch, args.heads, args.head_dim,
            iters=args.iters, cache_path=args.cache_path, verbose=True,
        )
        print(f"S={s}: best tiles {best[0]}x{best[1]} "
              f"(cached at {args.cache_path or _DEFAULT_CACHE})")


if __name__ == "__main__":
    main()
