"""Per-timestep (noise level) saliency-quality sweep.

Parity target: `experiments/per_timestep_segmentation/
test_segmentations_per_time.py:30-175` in the reference
(manuragkhullar/ConceptAttention): flux-dev 50-step shifted schedule,
segmentation quality per noise timestep, CSV output (and a line plot with
--plot, or via plot_segmentations_per_time.py from the CSV afterwards).
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
    parser.add_argument("--model_name", default="flux-dev")
    parser.add_argument("--tap", default="output")
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--label_size", type=int, default=224)
    parser.add_argument("--num_steps", type=int, default=50)
    parser.add_argument("--timesteps", type=int, nargs="+", default=None)
    parser.add_argument("--layers", type=int, nargs="+", default=list(range(14, 18)))
    parser.add_argument("--num_images", type=int, default=25)
    parser.add_argument("--output_csv", default="per_timestep_metrics.csv")
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

    timesteps = args.timesteps or list(range(0, args.num_steps, 5))
    dataset = ImagenetSegmentation(args.mat_path)
    pipe = ConceptAttentionFluxPipeline(args.model_name)

    stats = {
        t: dict(correct=0, labeled=0, inter=np.zeros(2), union=np.zeros(2))
        for t in timesteps
    }
    n = min(args.num_images, len(dataset))
    for i in range(n):
        image, gt_mask, name = dataset[i]
        target = name.split("_")[0].replace("-", " ")
        concepts = [target, "background", "floor", "sky"]
        label = (
            upsample_nearest(
                (gt_mask > 0).astype(np.float64), args.label_size, args.label_size
            ) > 0.5
        ).astype(np.int64)
        for t in timesteps:
            model = FluxTapSegmentationModel(
                pipe, tap=args.tap, num_steps=args.num_steps, noise_timestep=t,
                layer_indices=args.layers, width=args.width, height=args.width,
            )
            masks, _, _ = model(
                [image], target_concepts=[target], concepts=concepts, captions=[target]
            )
            pred = (
                upsample_nearest(
                    masks[0].astype(np.float64), args.label_size, args.label_size
                ) > 0.5
            ).astype(np.int64)
            c, lab = batch_pix_accuracy(pred, label)
            inter, union = batch_intersection_union(pred, label, 2)
            s = stats[t]
            s["correct"] += c
            s["labeled"] += lab
            s["inter"] += inter
            s["union"] += union
        print(f"[{i+1}/{n}] {name}", flush=True)

    with open(args.output_csv, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["timestep", "pix_acc", "miou"])
        for t in timesteps:
            s = stats[t]
            writer.writerow([
                t,
                s["correct"] / max(s["labeled"], 1),
                float(np.mean(s["inter"] / np.maximum(s["union"], 1))),
            ])
    print(f"wrote {args.output_csv}")
    if args.plot:
        from conceptattention_tpu.utils.sweep_plots import plot_sweep_csv

        png = _os.path.splitext(args.output_csv)[0] + ".png"
        print("wrote", plot_sweep_csv(args.output_csv, png, x_col="timestep",
                                      title="Noise Timestep vs Segmentation Performance"))


if __name__ == "__main__":
    main()
