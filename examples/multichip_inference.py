"""Mesh-sharded inference: generate with the DiT tensor-parallel over chips.

Run on real hardware with N chips, or locally on a virtual CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/multichip_inference.py --data 2 --model 4 --tiny
"""

import os as _os
import sys as _sys

# Allow running as a plain script from anywhere: put the repo root (one
# level up) on sys.path so `conceptattention_tpu` imports without install.
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)


import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", default="flux-schnell")
    parser.add_argument("--data", type=int, default=1)
    parser.add_argument("--model", type=int, default=None,
                        help="tensor-parallel width (default: all devices)")
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--prompt", default="A dragon standing on a rock")
    parser.add_argument("--concepts", nargs="+", default=["dragon", "rock", "sky"])
    parser.add_argument("--size", type=int, default=None)
    parser.add_argument("--steps", type=int, default=4)
    args = parser.parse_args()

    import jax

    from conceptattention_tpu import ConceptAttentionFluxPipeline
    from conceptattention_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    model = args.model if args.model is not None else n // args.data
    if model < 1 or args.data < 1 or args.data * model > n:
        raise SystemExit(
            f"invalid mesh: data={args.data} model={model} needs "
            f"{args.data * max(model, 1)} devices, have {n}"
        )
    mesh = make_mesh(data=args.data, model=model)
    print(f"mesh: data={args.data} model={model} over {n} devices")

    if args.tiny:
        args.model_name = "flux-tiny"
        size = args.size or 64
        import jax.numpy as jnp

        pipe = ConceptAttentionFluxPipeline(args.model_name, dtype=jnp.float32, mesh=mesh)
    else:
        size = args.size or 1024
        pipe = ConceptAttentionFluxPipeline(args.model_name, mesh=mesh)

    out = pipe.generate_image(
        prompt=args.prompt, concepts=args.concepts,
        width=size, height=size, num_inference_steps=args.steps,
    )
    out.image.save("multichip_output.png")
    print("wrote multichip_output.png with", len(out.concept_heatmaps), "heatmaps")


if __name__ == "__main__":
    main()
