"""Pallas TPU kernel: 3x3 stride-1 SAME convolution as 9 shifted GEMMs.

Why: the VAE decoder's conv stack is ~80% of the 151 ms/image 1024^2 decode
— itself 9% of the end-to-end headline (bench.py phases). XLA's conv
lowering measures 38-50 TFLOP/s at the decoder's NHWC shapes; this kernel
measures the same per-op rate but wins ~7% end-to-end decode (151.5 ->
141.4 ms/img on v5e) from tighter scheduling against the surrounding
GN/swish graph.

Decomposition: y[r, c] = sum_{dr, dc in 0..2} x[r+dr-1, c+dc-1] @ w[dr, dc]
with each tap a [tile_rows*W, C] x [C, Cout] matmul on the MXU.

Halo without overlapping BlockSpecs: the input is host-padded by the SAME
border (+1 row/col each side) plus one all-zero row-block, and the kernel
receives TWO CONSECUTIVE row-blocks of the padded array per grid step (two
in_specs over the same operand with index maps i and i+1); their
concatenation holds the ht + 2 input rows the ht output rows need.

Measured dead ends at 1024^2x128 (v5e, in-jit loop_rate):
  - W lives in the SUBLANE dim, so the in-kernel W-shifted slices lower to
    cross-sublane relayouts that dominate the MXU work (one shifted tap:
    12.2 ms vs three aligned row taps: 7.4 ms). This caps the kernel at
    XLA-conv rates; it is a layout property, not a scheduling one.
  - Folding the three column taps into channels on the host
    (xcat = concat(x[c-1], x[c], x[c+1]) -> three K=3C row-tap GEMMs, no
    in-kernel W slices) loses bigger: the materialized relayout + 3x HBM
    traffic measure 13.9 ms standalone and 212 ms/img decode.
Reaching beyond ~50 TFLOP/s here needs a different resident layout through
the whole decoder (e.g. width-packed channels), not a better conv kernel.

Used by models/flux/autoencoder.decode_nhwc (the bench's decode path) on
TPU; everything else (CPU, odd shapes) falls back to lax.conv. Equality vs
lax.conv_general_dilated is pinned in tests/test_conv3x3.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(xa_ref, xb_ref, w_ref, b_ref, o_ref, *, ht, w_out, fuse_swish):
    # xa/xb: two consecutive [1, ht, W+2, C] row-blocks of the padded input;
    # rows[r] = padded_x[i*ht + r], so output row r needs rows[r : r+3].
    xa = xa_ref[0]
    xb = xb_ref[0]
    rows = jnp.concatenate([xa, xb[:2]], axis=0)  # [ht+2, W+2, C]
    cin = rows.shape[-1]
    acc = None
    for dr in range(3):
        xr = rows[dr : dr + ht]  # [ht, W+2, C]
        for dc in range(3):
            xs = xr[:, dc : dc + w_out, :].reshape(ht * w_out, cin)
            part = jax.lax.dot_general(
                xs, w_ref[dr, dc], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    acc = acc + b_ref[...].astype(jnp.float32)
    if fuse_swish:
        acc = acc * jax.nn.sigmoid(acc)
    o_ref[0] = acc.reshape(ht, w_out, -1).astype(o_ref.dtype)


def _pick_ht(h: int, w: int, cin: int, cout: int, itemsize: int = 2) -> int:
    """Output rows per grid step: keep the GEMM M dim >= ~8k for MXU
    efficiency, bounded by VMEM (two input blocks + f32 accumulator).

    `itemsize` must be the INPUT dtype's: this bound was originally written
    with bf16 hard-coded, which let f32 decodes (the pipeline casts the VAE
    to f32) pick row-tiles 2x too big — the compiler's scoped-vmem stack
    (blocks + concat temp + 9 tap slices + accumulator, ~5x this estimate)
    measured 123.7M against a 96.25M limit at 512^2 x 256 f32 and failed the
    remote AOT compile. Honoring itemsize halves ht there and the stack
    fits."""
    ht = 8
    while ht < h and ht * w < 8192:
        ht *= 2
    while ht > 8 and (2 * ht * (w + 2) * cin * itemsize + ht * w * cout * 4) > 24e6:
        ht //= 2
    while h % ht:
        ht //= 2
    return max(ht, 1)


@functools.partial(jax.jit, static_argnames=("fuse_swish", "interpret"))
def conv3x3_same(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    fuse_swish: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """3x3 stride-1 SAME NHWC convolution: x [B, H, W, C] * w [3, 3, C, Cout]
    + b [Cout] -> [B, H, W, Cout] (x.dtype). `fuse_swish` applies
    x*sigmoid(x) to the f32 accumulator before the output cast."""
    batch, h, w_dim, cin = x.shape
    cout = w.shape[-1]
    ht = _pick_ht(h, w_dim, cin, cout, x.dtype.itemsize)
    nt = h // ht
    # SAME border + one extra all-zero row-block so the bottom tile's
    # second (i+1) input block exists.
    xp = jnp.pad(x, ((0, 0), (1, ht + 1), (1, 1), (0, 0)))

    spec_lo = pl.BlockSpec((1, ht, w_dim + 2, cin), lambda bi, i: (bi, i, 0, 0))
    spec_hi = pl.BlockSpec((1, ht, w_dim + 2, cin), lambda bi, i: (bi, i + 1, 0, 0))
    # Scoped-VMEM stack: two input blocks + concat temp + per-tap slice
    # copies + the f32 accumulator exceed the 16 MB default at 1024^2 tiles
    # (measured 19.45M); budget 4x the operand estimate like flash_saliency.
    est = 2 * ht * (w_dim + 2) * cin * x.dtype.itemsize + ht * w_dim * cout * 4
    vmem_limit = int(min(128 * 1024 * 1024, max(32 * 1024 * 1024, 4 * est)))
    _cp_cls = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams", None
    )
    compiler_params = None
    if _cp_cls is not None:
        try:
            compiler_params = _cp_cls(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=vmem_limit,
            )
        except TypeError:  # older pallas without these fields
            compiler_params = None
    out = pl.pallas_call(
        functools.partial(
            _conv_kernel, ht=ht, w_out=w_dim, fuse_swish=fuse_swish
        ),
        grid=(batch, nt),
        in_specs=[
            spec_lo,
            spec_hi,
            pl.BlockSpec((3, 3, cin, cout), lambda bi, i: (0, 0, 0, 0)),
            pl.BlockSpec((cout,), lambda bi, i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, ht, w_dim, cout), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, h, w_dim, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * h * w_dim * cin * cout * 9,
            bytes_accessed=(
                x.size * x.dtype.itemsize
                + batch * h * w_dim * cout * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(xp, xp, w, b)
    return out


def use_conv3x3_kernel(x_shape, cin: int, cout: int, dtype=None) -> bool:
    """Gate: the kernel wants lane-friendly channel counts, H divisible into
    row-tiles, and (when `dtype` is given) a 2-byte input — the f32 variant's
    scoped-VMEM stack exceeds this chip's compile limit at decoder shapes
    (isolated repro: 512^2 x 256 f32 fails the remote AOT compile at every
    row-tile size; bf16 compiles and is the measured production path).
    Everything else stays on lax.conv."""
    _, h, w_dim, _ = x_shape
    if dtype is not None and jnp.dtype(dtype).itemsize > 2:
        return False
    try:
        backend = jax.default_backend().lower()
    except Exception:
        return False
    return (
        cin % 128 == 0
        and cout % 128 == 0
        and h % 8 == 0
        and w_dim >= 8
        and ("tpu" in backend or "axon" in backend)
    )
