"""Per-layer saliency-quality sweep.

Parity target: `experiments/per_layer_segmentation/
test_segmentations_per_layer.py:28-244` in the reference
(manuragkhullar/ConceptAttention): evaluate segmentation metrics per DiT
double-block layer (19 for full Flux), emit CSV (and a line plot with
--plot, or via plot_segmentations_per_layer.py from the CSV afterwards).

TPU-first: the forward pass already returns maps for ALL layers in one run
([depth, B, C, P]); the sweep reuses a single forward per image instead of
re-running the model per layer.
"""

import os as _os
import sys as _sys

# Allow running as a plain script from anywhere: put the repo root (two
# levels up) on sys.path so `conceptattention_tpu` imports without install.
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", ".."))
)


import argparse
import csv
import sys

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mat_path", required=True)
    parser.add_argument("--model_name", default="flux-schnell")
    parser.add_argument("--tap", default="output")
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--label_size", type=int, default=224)
    parser.add_argument("--num_steps", type=int, default=4)
    parser.add_argument("--noise_timestep", type=int, default=2)
    parser.add_argument("--num_images", type=int, default=50)
    parser.add_argument("--output_csv", default="per_layer_metrics.csv")
    parser.add_argument("--plot", action="store_true",
                        help="also write <output_csv>.png line plot")
    args = parser.parse_args()

    from conceptattention_tpu import ConceptAttentionFluxPipeline
    from conceptattention_tpu.evals.datasets import ImagenetSegmentation
    from conceptattention_tpu.evals.metrics import batch_intersection_union, batch_pix_accuracy
    from conceptattention_tpu.evals.segmentation import FluxTapSegmentationModel
    from conceptattention_tpu.utils.plotting import upsample_nearest

    if not ImagenetSegmentation.available(args.mat_path):
        print(f"dataset not found at {args.mat_path}", file=sys.stderr)
        sys.exit(2)

    dataset = ImagenetSegmentation(args.mat_path)
    pipe = ConceptAttentionFluxPipeline(args.model_name)
    depth = pipe.cfg.depth

    # One forward per image (per_layer_coefficients) yields all layers' maps;
    # the layer loop below only thresholds and scores.
    stats = {l: dict(correct=0, labeled=0, inter=np.zeros(2), union=np.zeros(2)) for l in range(depth)}

    n = min(args.num_images, len(dataset))
    base_model = FluxTapSegmentationModel(
        pipe, tap=args.tap, num_steps=args.num_steps,
        noise_timestep=args.noise_timestep, width=args.width, height=args.width,
    )
    for i in range(n):
        image, gt_mask, name = dataset[i]
        target = name.split("_")[0].replace("-", " ")
        concepts = [target, "background", "floor", "sky"]
        # ONE forward yields every layer's maps; the per-layer loop only
        # thresholds and scores.
        coeffs = base_model.per_layer_coefficients(image, concepts, target)
        label = (
            upsample_nearest(
                (gt_mask > 0).astype(np.float64), args.label_size, args.label_size
            ) > 0.5
        ).astype(np.int64)
        for layer in range(depth):
            cmap = coeffs[layer, 0]  # target concept is index 0
            mask = (cmap > cmap.mean()).astype(np.float64)
            pred = (
                upsample_nearest(mask, args.label_size, args.label_size) > 0.5
            ).astype(np.int64)
            c, lab = batch_pix_accuracy(pred, label)
            inter, union = batch_intersection_union(pred, label, 2)
            s = stats[layer]
            s["correct"] += c
            s["labeled"] += lab
            s["inter"] += inter
            s["union"] += union
        print(f"[{i+1}/{n}] {name}", flush=True)

    with open(args.output_csv, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["layer", "pix_acc", "miou"])
        for layer in range(depth):
            s = stats[layer]
            writer.writerow([
                layer,
                s["correct"] / max(s["labeled"], 1),
                float(np.mean(s["inter"] / np.maximum(s["union"], 1))),
            ])
    print(f"wrote {args.output_csv}")
    if args.plot:
        from conceptattention_tpu.utils.sweep_plots import plot_sweep_csv

        png = _os.path.splitext(args.output_csv)[0] + ".png"
        print("wrote", plot_sweep_csv(args.output_csv, png, x_col="layer",
                                      title="Layer vs Segmentation Performance"))


if __name__ == "__main__":
    main()
