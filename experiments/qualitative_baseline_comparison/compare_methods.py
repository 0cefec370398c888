"""Qualitative side-by-side: any subset of the 15 segmentation baselines on
one image — soft saliency (and optionally hard masks) per method.

Parity target: the reference's qualitative scripts —
`experiments/qualitative_baseline_comparison/*.py` (flux taps) and
`experiments/all_method_segmentation_qualitative_comparison/compare_each_method.py`
(all ~13 methods incl. DINO/TextSpan/Chefer) in manuragkhullar/ConceptAttention —
collapsed into one driver: every method resolves through
`evals.model_zoo.build_segmentation_model`, and the flux baselines are tap
points of one shared forward pass.

Checkpoints come from the usual env vars (CHEFER_VITB16, DINO_VITB16,
SD2_UNET, SDXL_UNET, OPENCLIP_VITH14; the flux pipeline from FLUX_* / AE).
`--random_weights --tiny` runs every family at smoke scale with seeded
random params (figure renders, saliency is meaningless) — the mode the
subprocess test uses.
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

FLUX_METHODS = ("RawOutputSpace", "RawCrossAttention", "RawValueSpace", "DAAMFlux")


def build_method(name: str, args, pipe):
    """One SegmentationModel per method name, with family-appropriate
    construction (flux taps share `pipe`; the rest load env-var checkpoints
    or seeded random params)."""
    from conceptattention_tpu.evals.model_zoo import build_segmentation_model

    if name in FLUX_METHODS:
        kwargs = dict(width=args.width, height=args.width)
        if args.tiny:
            kwargs.update(num_steps=2, noise_timestep=1)
        return build_segmentation_model(name, pipeline=pipe, **kwargs)
    extra = {}
    if name in ("DAAMSD2", "DAAMSDXL") and args.tiny:
        extra["latent_size"] = 8
    return build_segmentation_model(
        name, random_weights=args.random_weights, tiny=args.tiny, **extra
    )


def _resize_map(arr: np.ndarray, size: int) -> np.ndarray:
    """[h, w] float map -> [size, size] (nearest, matching the reference's
    64x64 nearest-resize of maps/gt in compare_each_method.py)."""
    import PIL.Image

    img = PIL.Image.fromarray(np.asarray(arr, np.float32), mode="F")
    return np.asarray(img.resize((size, size), PIL.Image.NEAREST))


def main():
    from conceptattention_tpu.evals.model_zoo import MODEL_CHOICES

    parser = argparse.ArgumentParser()
    parser.add_argument("--image", required=True)
    parser.add_argument("--caption", default="a photo")
    parser.add_argument("--concepts", nargs="+", required=True)
    parser.add_argument("--target", default=None)
    parser.add_argument("--methods", nargs="+", default=list(FLUX_METHODS),
                        help=f"method names from {MODEL_CHOICES}, or 'all'")
    parser.add_argument("--model_name", default="flux-schnell",
                        help="flux config for the tap methods")
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--map_size", type=int, default=64,
                        help="all maps are nearest-resized to this grid "
                             "for the figure (methods differ in native "
                             "resolution)")
    parser.add_argument("--hard_masks", action="store_true",
                        help="also plot each method's mean-thresholded "
                             "binary mask")
    parser.add_argument("--random_weights", action="store_true",
                        help="seeded random params for non-flux baselines "
                             "(smoke mode; saliency is meaningless)")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny per-family configs (smoke mode)")
    parser.add_argument("--output", default="method_comparison.png")
    args = parser.parse_args()
    if args.methods == ["all"]:
        args.methods = list(MODEL_CHOICES)
    unknown = sorted(set(args.methods) - set(MODEL_CHOICES))
    if unknown:
        raise SystemExit(f"unknown methods {unknown}; choose from {MODEL_CHOICES}")

    import PIL.Image

    from conceptattention_tpu.utils.plotting import plot_concept_heatmaps

    image = np.asarray(PIL.Image.open(args.image).convert("RGB"))
    target = args.target or args.concepts[0]
    if target not in args.concepts:
        # validate before the (minutes-long) model forwards run
        raise SystemExit(
            f"--target {target!r} is not one of --concepts {args.concepts}"
        )

    pipe = None
    if any(m in FLUX_METHODS for m in args.methods):
        from conceptattention_tpu import ConceptAttentionFluxPipeline

        pipe = ConceptAttentionFluxPipeline(args.model_name)

    rows, labels = [], []
    idx = args.concepts.index(target)
    for name in args.methods:
        model = build_method(name, args, pipe)
        coeff, _ = model.segment_individual_image(image, args.concepts, args.caption)
        soft = _resize_map(np.asarray(coeff)[idx], args.map_size)
        rows.append(soft)
        labels.append(name)
        print(f"{name}: coeff range [{soft.min():.3f}, {soft.max():.3f}]")
        if args.hard_masks:
            rows.append((soft >= soft.mean()).astype(np.float32))
            labels.append(f"{name} mask")
        del model  # free this family's params before building the next

    plot_concept_heatmaps(image, np.stack(rows), labels, save_path=args.output)
    print(f"wrote {args.output} ({len(args.methods)} methods)")


if __name__ == "__main__":
    main()
