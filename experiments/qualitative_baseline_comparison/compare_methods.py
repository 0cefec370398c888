"""Qualitative side-by-side: concept attention vs. cross-attention vs. value
space vs. DAAM on one image.

Parity target: the reference's qualitative scripts
(`experiments/qualitative_baseline_comparison/*.py` and
`experiments/all_method_segmentation_qualitative_comparison/` in
manuragkhullar/ConceptAttention), collapsed into one driver since every Flux
baseline here is a tap point of the same forward pass.
"""

import os as _os
import sys as _sys

# Allow running as a plain script from anywhere: put the repo root (two
# levels up) on sys.path so `conceptattention_tpu` imports without install.
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", ".."))
)


import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", required=True)
    parser.add_argument("--caption", default="a photo")
    parser.add_argument("--concepts", nargs="+", required=True)
    parser.add_argument("--target", default=None)
    parser.add_argument("--model_name", default="flux-schnell")
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--output", default="method_comparison.png")
    args = parser.parse_args()

    import PIL.Image

    from conceptattention_tpu import ConceptAttentionFluxPipeline
    from conceptattention_tpu.evals.segmentation import (
        DAAMFluxSegmentationModel,
        FluxTapSegmentationModel,
    )
    from conceptattention_tpu.utils.plotting import plot_concept_heatmaps

    image = np.asarray(PIL.Image.open(args.image).convert("RGB"))
    target = args.target or args.concepts[0]
    if target not in args.concepts:
        # validate before the (minutes-long) model forwards run
        raise SystemExit(
            f"--target {target!r} is not one of --concepts {args.concepts}"
        )
    pipe = ConceptAttentionFluxPipeline(args.model_name)

    methods = {
        "concept_attention": FluxTapSegmentationModel(
            pipe, tap="output", width=args.width, height=args.width
        ),
        "cross_attention": FluxTapSegmentationModel(
            pipe, tap="cross_attention", width=args.width, height=args.width
        ),
        "value_space": FluxTapSegmentationModel(
            pipe, tap="value", width=args.width, height=args.width
        ),
        "daam": DAAMFluxSegmentationModel(pipe, width=args.width, height=args.width),
    }
    rows = []
    for name, model in methods.items():
        coeff, _ = model.segment_individual_image(image, args.concepts, args.caption)
        idx = args.concepts.index(target)
        rows.append(coeff[idx])
        print(f"{name}: coeff range [{coeff[idx].min():.3f}, {coeff[idx].max():.3f}]")

    plot_concept_heatmaps(
        image, np.stack(rows), list(methods.keys()), save_path=args.output
    )
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
