"""Device-mesh construction for the DP x TP (x SP) sharding of the DiT.

The reference is single-process/single-GPU with host<->device offload
choreography (SURVEY.md §2g census); its only distributed code is vendored and
unused. Here multi-chip scaling is first-class: a `jax.sharding.Mesh` with
axes

  - `data`:  batch data-parallelism (outer axis; rides DCN across pods),
  - `model`: tensor parallelism over attention heads / MLP hidden (ICI),
  - `seq`:   optional sequence/context parallelism over image patches for
             video-length sequences (ICI),
  - `pipe`:  pipeline stages (layer chunks; nearest-neighbor boundary hops),
  - `expert`: expert parallelism for MoE layers (parallel/moe.py; token
             dispatch via all_to_all inside the ep group).

Collectives are inserted by GSPMD from the param/activation shardings — no
NCCL-style external backend exists or is needed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    model: str = "model"
    seq: str = "seq"
    pipe: str = "pipe"
    expert: str = "expert"


AXES = MeshAxes()


def make_mesh(
    data: int = 1,
    model: int = 1,
    seq: int = 1,
    pipe: int = 1,
    expert: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, pipe, expert, seq, model) mesh. `model` should map to
    the fastest ICI axis (innermost), `data` to the slowest/DCN; `pipe`
    stages exchange only layer-boundary activations (parallel/pipeline.py)
    and `expert` groups exchange routed token blocks (parallel/moe.py), so
    they sit between."""
    if devices is None:
        devices = jax.devices()
    n = data * model * seq * pipe * expert
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(data, pipe, expert, seq, model)
    return Mesh(grid, (AXES.data, AXES.pipe, AXES.expert, AXES.seq, AXES.model))
