"""Pipeline parallelism (pp) over a stacked layer pytree.

Not present in the reference (manuragkhullar/ConceptAttention is
single-device; SURVEY.md §2g makes multi-chip scaling this framework's
obligation). The DiT is a stack of identical blocks applied under lax.scan —
exactly the shape classic GPipe-style SPMD pipelining wants:

  - the [depth, ...] parameter stack is split into `pipe` contiguous stages,
    one stage resident per device along the mesh's `pipe` axis;
  - the batch is split into microbatches; each pipeline tick every stage
    applies its local layer chunk to one microbatch and hands the boundary
    activation to the next stage with a single `ppermute` hop (nearest
    neighbor on ICI — no all-to-all, no weight movement);
  - a run of M microbatches over S stages completes in M + S - 1 ticks
    (the classic bubble); utilization = M / (M + S - 1).

The whole schedule is one jit-compiled program: the tick loop is a Python
loop over static tick indices, so XLA sees a straight-line schedule it can
overlap with the per-stage compute.

Sharding semantics: params shard over the `pipe` axis (one stage per
device row) and, when `layer_param_spec` is given, ALSO over the other mesh
axes per-leaf (e.g. Megatron `model`-axis specs from parallel/sharding.py)
— each stage's weights are then genuinely tensor-sharded and `layer_fn`
must be TP-aware (psum-decomposed matmuls, e.g.
`double_block(..., tp_axis="model")`). Without it, non-pipe axes replicate
the stage compute (pure-pp serving).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


from conceptattention_tpu.parallel._compat import shard_map_compat as _shard_map


def _leading(tree) -> int:
    return jax.tree.leaves(tree)[0].shape[0]


def pipeline_apply(
    layer_fn: Callable[[Any, Any], Any],
    stacked_params: Any,
    carry: Any,
    mesh,
    axis: str = "pipe",
    num_microbatches: int | None = None,
    with_outputs: bool = False,
    layer_param_spec: Any = None,
    shape_probe_fn: Callable[[Any, Any], Any] | None = None,
    batch_axis: str | None = None,
) -> Any:
    """Apply `depth` stacked layers to `carry` with GPipe pipelining.

    layer_fn(layer_params, carry) -> carry applies ONE layer (closures may
    capture replicated side inputs: position embeddings, modulation vectors).
    `stacked_params` leaves are [depth, ...] with depth % n_stages == 0;
    `carry` leaves are [batch, ...] with batch % num_microbatches == 0.

    With `with_outputs=True`, layer_fn returns (carry, y) per layer — the
    lax.scan ys convention — and pipeline_apply returns (carry, ys).
    Batch-leading y leaves (saliency maps are [B, C, P]) come back stacked
    [depth, batch, ...], exactly matching scan; non-batch-leading leaves
    (per-layer scalars/vectors) come back [depth, num_microbatches, ...] with
    per-microbatch values (scan's single full-batch value does not exist in a
    pipelined schedule) and stay replicated on any `batch_axis`. Each stage
    keeps only the per-layer outputs it computed and one all-gather over the
    pipe axis assembles the full stack, so tap traffic never rides the
    per-tick boundary hops.

    `batch_axis` composes pp with DATA parallelism in the same mesh: each
    microbatch's rows shard over that axis (every data row runs the full
    pipeline schedule on its slice of every microbatch — boundary ppermutes
    stay within the data slice). Requires batch/num_microbatches divisible
    by the axis size.

    `layer_param_spec` is an optional per-LAYER PartitionSpec pytree (leaf
    specs WITHOUT the depth axis, e.g. sharding._double_block_spec()): leaves
    become P(pipe, None, *leaf_spec), so stage weights are tensor-sharded
    over the other mesh axes and layer_fn must psum accordingly
    (`double_block(..., tp_axis=...)`). `shape_probe_fn` is a psum-free
    equivalent of layer_fn used only to eval_shape the per-layer outputs
    (collectives cannot trace outside the shard_map); defaults to layer_fn.

    Equals `lax.scan(layer_fn, carry, stacked_params)` exactly (same layer
    order, same microbatch-independent math) — tested in
    tests/test_pipeline_parallel.py.
    """
    stages = mesh.shape[axis]
    depth = _leading(stacked_params)
    if depth % stages != 0:
        raise ValueError(f"depth {depth} not divisible by {stages} pipe stages")
    m = num_microbatches or stages
    batch = _leading(carry)
    if batch % m != 0:
        raise ValueError(f"batch {batch} not divisible by {m} microbatches")

    from jax.sharding import PartitionSpec as P

    # Stage-major parameter layout: [stages, depth/stages, ...]; shard_map
    # slices axis 0 so each device sees its own [1, depth/stages, ...] chunk.
    p_staged = jax.tree.map(
        lambda a: a.reshape(stages, depth // stages, *a.shape[1:]), stacked_params
    )
    # Microbatch-major carry: [m, batch/m, ...] (replicated into every stage;
    # boundary activations are what travels, weights never move).
    c_micro = jax.tree.map(
        lambda a: a.reshape(m, batch // m, *a.shape[1:]), carry
    )

    def stage_body(local_p, xm):
        local_p = jax.tree.map(lambda a: a[0], local_p)  # [depth/stages, ...]
        idx = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % stages) for i in range(stages)]

        def chunk(c):
            def body(c, lp):
                if with_outputs:
                    return layer_fn(lp, c)
                return layer_fn(lp, c), None

            return jax.lax.scan(body, c, local_p)

        zero = jax.tree.map(lambda a: jnp.zeros_like(a[0]), xm)
        state = zero
        last_stage_outs = []
        tick_ys = []
        for t in range(m + stages - 1):
            # Stage 0 injects microbatch t; later stages consume the
            # activation handed over on the previous tick.
            inject = jax.tree.map(lambda a: a[min(t, m - 1)], xm)
            cur = jax.tree.map(
                lambda i, s: jnp.where(idx == 0, i, s) if t < m else s,
                inject, state,
            )
            out, ys = chunk(cur)
            tick_ys.append(ys)
            if t >= stages - 1:  # last stage finished microbatch t-(stages-1)
                last_stage_outs.append(out)
            state = jax.lax.ppermute(out, axis, perm)
        y = jax.tree.map(lambda *xs: jnp.stack(xs), *last_stage_outs)
        # Only the last stage holds real outputs; psum of the masked stack
        # replicates them (cheap: one hop of boundary activations).
        mask = (idx == stages - 1).astype(jnp.float32)
        y = jax.tree.map(
            lambda a: jax.lax.psum(a * mask.astype(a.dtype), axis), y
        )
        if not with_outputs:
            return y
        # Stage `idx` computed microbatch j's local-layer outputs at tick
        # j + idx; gather them out of the tick buffers with a masked select
        # (tick index is static, stage index is traced).
        def select_mb(j):
            def leaf(*ticks):
                acc = None
                for s in range(stages):
                    term = jnp.where(idx == s, ticks[j + s], jnp.zeros_like(ticks[j + s]))
                    acc = term if acc is None else acc + term
                return acc

            return jax.tree.map(leaf, *tick_ys)

        # [m, local_depth, mb, ...] per stage; leading length-1 stage axis is
        # sharded over `pipe` in out_specs, so the return is one all-gather.
        ys_local = jax.tree.map(lambda *xs: jnp.stack(xs)[None], *[select_mb(j) for j in range(m)])
        return y, ys_local

    if layer_param_spec is None:
        spec_p = jax.tree.map(lambda _: P(axis), p_staged)
    else:
        # [stages, local_depth, ...leaf dims]: pipe on the stage axis, the
        # caller's tensor-parallel spec on the trailing weight dims.
        spec_p = jax.tree.map(
            lambda leaf_spec: P(axis, None, *leaf_spec), layer_param_spec,
            is_leaf=lambda x: isinstance(x, P),
        )
    # carry layout is [m, batch/m, ...]: with a batch_axis the per-microbatch
    # rows shard over it (pp x dp); otherwise replicated.
    spec_x = jax.tree.map(lambda _: P(None, batch_axis), c_micro)
    spec_y = jax.tree.map(lambda _: P(None, batch_axis), c_micro)
    if with_outputs:
        # Probe output structure to build specs for ys: [stages, m, local_depth, mb, ...]
        probe_c = jax.tree.map(lambda a: a[0], c_micro)
        probe_p = jax.tree.map(lambda a: a[0, 0], p_staged)
        probe = shape_probe_fn or layer_fn
        _, y_shape = jax.eval_shape(lambda p, c: probe(p, c), probe_p, probe_c)
        # ys are [stages, m, local_depth, *leaf]: stage axis over pipe and —
        # only for batch-leading leaves — microbatch rows over the data axis
        # when composing pp x dp. Per-leaf specs: a scalar/vector aux leaf
        # (per-layer norm, loss, ...) has no mb dim to shard, and a length-4
        # fixed spec would either over-rank it or misshard a [C] vector over
        # `data`, so those leaves stay replicated on the data axis.
        mb_rows = batch // m

        def _spec_for_y(leaf):
            if (batch_axis is not None and leaf.ndim >= 1
                    and leaf.shape[0] == mb_rows):
                return P(axis, None, None, batch_axis)
            return P(axis, None, None)

        spec_ys = jax.tree.map(_spec_for_y, y_shape)
        y, ys = _shard_map(
            stage_body, mesh, (spec_p, spec_x), (spec_y, spec_ys)
        )(p_staged, c_micro)
        carry_out = jax.tree.map(lambda a: a.reshape(batch, *a.shape[2:]), y)
        # Batch-leading leaves: [stages, m, local_depth, mb, ...] ->
        # [depth, batch, ...] (scan-identical). Other leaves (per-layer
        # scalars/vectors) keep their per-microbatch values:
        # [depth, m, ...] — scan's full-batch value does not exist here.
        def assemble(a):
            s, mm, ld = a.shape[:3]
            a = jnp.moveaxis(a, 2, 1)  # [stages, local_depth, m, *leaf]
            if a.ndim >= 4 and a.shape[3] == mb_rows:
                return a.reshape(s * ld, mm * a.shape[3], *a.shape[4:])
            return a.reshape(s * ld, mm, *a.shape[3:])

        return carry_out, jax.tree.map(assemble, ys)
    y = _shard_map(stage_body, mesh, (spec_p, spec_x), spec_y)(p_staged, c_micro)
    return jax.tree.map(lambda a: a.reshape(batch, *a.shape[2:]), y)
