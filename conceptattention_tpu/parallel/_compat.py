"""JAX version-compat shims shared by the parallel package."""

from __future__ import annotations


def shard_map_compat(fn, mesh, in_specs, out_specs):
    """`jax.shard_map` across the 0.7/0.8 API moves: top-level vs
    experimental module, and the check_rep -> check_vma rename."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map
    kwargs = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    try:
        return shard_map(fn, check_vma=False, **kwargs)
    except TypeError:
        return shard_map(fn, check_rep=False, **kwargs)
