"""LoRA fine-tuning quickstart: train low-rank adapters on a frozen Flux
base, export them as a safetensors-compatible state dict, and reload them
through the serving pipeline.

Runs end to end on CPU with the tiny config and synthetic data (no
checkpoints exist in this environment); point model_name at "flux-schnell"
plus FLUX_SCHNELL=... for real training on the TPU. The frozen base may be
int8-quantized (quantize="w8"/"w8a8") — the adapters train in f32 either way
and merge back into the quantized stacks at serve time.

Usage: python examples/lora_finetune.py [--steps 30] [--rank 8]
"""

import argparse
import os
import sys

# Make the repo root (one level up) importable without an install.
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

if not os.environ.get("JAX_PLATFORMS"):
    os.environ["JAX_PLATFORMS"] = "cpu"  # tiny-config demo: CPU is plenty

import jax
import jax.numpy as jnp
import numpy as np
import optax

from conceptattention_tpu.config import configs
from conceptattention_tpu.models.flux.params import init_flux_params
from conceptattention_tpu.ops.packing import make_img_ids
from conceptattention_tpu.training.lora import (
    export_lora_state_dict,
    init_lora_params,
    make_lora_train_step,
)


def synthetic_batch(cfg, key, batch=4, grid=(8, 8), txt_tokens=8):
    """Stand-in for a real (packed-latent, text-embedding) dataset."""
    ks = jax.random.split(key, 3)
    p = grid[0] * grid[1]
    return {
        "img": jax.random.normal(ks[0], (batch, p, cfg.in_channels)),
        "img_ids": make_img_ids(*grid, batch),
        "txt": jax.random.normal(ks[1], (batch, txt_tokens, cfg.context_in_dim)),
        "txt_ids": jnp.zeros((batch, txt_tokens, 3)),
        "y": jax.random.normal(ks[2], (batch, cfg.vec_in_dim)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_name", default="flux-tiny")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="/tmp/flux_lora.safetensors")
    args = ap.parse_args()

    cfg = configs[args.model_name].params
    base = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32)

    # Adapter-only optimizer state: the 12B base never enters adamw.
    lora = init_lora_params(jax.random.PRNGKey(1), base, rank=args.rank)
    tx = optax.adamw(args.lr)
    opt_state = tx.init(lora)
    step = make_lora_train_step(cfg, tx, donate=False)

    data_key, step_key = jax.random.PRNGKey(2), jax.random.PRNGKey(3)
    for i in range(args.steps):
        batch = synthetic_batch(cfg, jax.random.fold_in(data_key, i))
        lora, opt_state, loss = step(
            lora, opt_state, base, batch, jax.random.fold_in(step_key, i)
        )
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.4f}")

    # Export in the BFL-tree PEFT naming the loader understands.
    sd = export_lora_state_dict(lora)
    try:
        from safetensors.numpy import save_file

        save_file({k: np.asarray(v) for k, v in sd.items()}, args.out)
        print(f"wrote {len(sd)} tensors to {args.out}")
    except ImportError:
        np.savez(args.out + ".npz", **{k: np.asarray(v) for k, v in sd.items()})
        print(f"safetensors unavailable; wrote {args.out}.npz")

    # Reload through the serving pipeline (adapters merge at load time).
    from conceptattention_tpu import ConceptAttentionFluxPipeline

    pipe = ConceptAttentionFluxPipeline(
        args.model_name, dtype=jnp.float32, params=base,
        lora=args.out if os.path.exists(args.out) else None,
    )
    out = pipe.generate_image(
        "a photo of a dragon", ["dragon", "sky"],
        width=64, height=64, num_inference_steps=2,
    )
    print(f"generated {out.image.size} image with "
          f"{len(out.concept_heatmaps)} concept heatmaps under the adapter")


if __name__ == "__main__":
    main()
