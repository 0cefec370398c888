"""Param-pytree checkpointing via orbax.

The reference only *loads* checkpoints (safetensors -> state dict,
`flux/src/flux/util.py:105-127`); this framework also needs durable
save/restore for the training path (train_step.py) and for caching converted
weights. Orbax handles sharded arrays natively, so a TP-sharded param tree
round-trips with its shardings.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax


def save_params(path: str, params: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_params(path: str, like: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore a param pytree. `like` (abstract or concrete pytree) restores
    with matching structure/sharding; without it, restores as saved."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)
