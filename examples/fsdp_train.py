"""Fine-tune the Flux DiT with FSDP (ZeRO-3) over a device mesh.

Demonstrates the training-side parallelism stack: params and adamw moments
fully sharded over the `data` mesh axis (parallel/fsdp.py), composed with
Megatron tensor parallelism over `model`, driven through the production
train loop (warmup-cosine LR, grad accumulation, EMA, checkpoint/resume).

Runs anywhere: on a TPU slice the mesh axes map onto real chips; with no
hardware it self-bootstraps an 8-device virtual CPU mesh (tiny config,
random data) so the full sharded path is exercisable on a laptop:

    python examples/fsdp_train.py            # virtual 8-device CPU mesh
    python examples/fsdp_train.py --data 4 --model 2 --steps 10
"""

import argparse
import os
import sys

# Allow running as a plain script from anywhere: put the repo root (one
# level up) on sys.path so `conceptattention_tpu` imports without install.
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

# Virtual-mesh bootstrap must happen before the first JAX backend init.
parser = argparse.ArgumentParser()
parser.add_argument("--data", type=int, default=4, help="FSDP/data axis size")
parser.add_argument("--model", type=int, default=2, help="TP axis size")
parser.add_argument("--steps", type=int, default=5)
parser.add_argument("--batch", type=int, default=8)
parser.add_argument("--ckpt_dir", default=None, help="orbax checkpoint dir")
parser.add_argument("--real_devices", action="store_true",
                    help="use the attached accelerators instead of a virtual CPU mesh")
args = parser.parse_args()

n = args.data * args.model
if not args.real_devices:
    if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp

if not args.real_devices:
    # Some hosts' sitecustomize re-registers an accelerator plugin after
    # import, trampling JAX_PLATFORMS; force the CPU backend explicitly.
    jax.config.update("jax_platforms", "cpu")
from jax.sharding import NamedSharding, PartitionSpec as P

import conceptattention_tpu  # noqa: F401  (re-applies JAX_PLATFORMS; see CLAUDE.md)
from conceptattention_tpu.config import configs
from conceptattention_tpu.models.flux.params import init_flux_params
from conceptattention_tpu.ops.packing import make_img_ids
from conceptattention_tpu.parallel.fsdp import flux_fsdp_sharding, shard_params_fsdp
from conceptattention_tpu.parallel.mesh import AXES, make_mesh

cfg = configs["flux-tiny"].params
mesh = make_mesh(data=args.data, model=args.model)
print(f"mesh: data={args.data} (FSDP+DP) x model={args.model} (TP) "
      f"on {jax.devices()[0].platform}")

params = shard_params_fsdp(
    init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32), mesh, cfg
)
qkv = params["double"]["img_qkv"]["w"]
print(f"qkv weight {qkv.shape} -> per-device shard "
      f"{qkv.addressable_shards[0].data.shape}")

b, grid, t = args.batch, (4, 4), 4


def make_batch(key):
    keys = jax.random.split(key, 3)
    return dict(
        img=jax.random.normal(keys[0], (b, grid[0] * grid[1], cfg.in_channels)),
        img_ids=make_img_ids(*grid, batch_size=b),
        txt=jax.random.normal(keys[1], (b, t, cfg.context_in_dim)),
        txt_ids=jnp.zeros((b, t, 3)),
        y=jax.random.normal(keys[2], (b, cfg.vec_in_dim)),
    )


batch_sharding = jax.tree.map(
    lambda _: NamedSharding(mesh, P(AXES.data)), make_batch(jax.random.PRNGKey(1))
)

from conceptattention_tpu.training.train_loop import TrainConfig, train_loop

result = train_loop(
    params,
    cfg,
    data=(
        jax.tree.map(jax.device_put, make_batch(jax.random.PRNGKey(100 + i)),
                     batch_sharding)
        for i in range(args.steps)
    ),
    tc=TrainConfig(
        total_steps=args.steps, warmup_steps=1, learning_rate=1e-4,
        log_every=1, checkpoint_dir=args.ckpt_dir,
    ),
    mesh=mesh,
    param_sharding=flux_fsdp_sharding(params, mesh, cfg),
    batch_sharding=batch_sharding,
)
print(f"done: final loss {result['losses'][-1]:.4f} at step {result['step']}")
