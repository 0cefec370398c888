"""PascalVOC multi-class zero-shot segmentation via concept argmax.

Parity target: `experiments/pascal_voc_segmentation/
run_multi_class_seg_experiment.py:39-279` in the reference
(manuragkhullar/ConceptAttention): all 20 VOC classes + background as the
concept vocabulary; per-pixel argmax over concept coefficient maps; mIoU over
classes present in each image.
"""

import os as _os
import sys as _sys

# Allow running as a plain script from anywhere: put the repo root (two
# levels up) on sys.path so `conceptattention_tpu` imports without install.
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", ".."))
)


import argparse
import sys

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--voc_root", required=True)
    parser.add_argument("--model_name", default="flux-schnell")
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--label_size", type=int, default=224)
    parser.add_argument("--num_steps", type=int, default=4)
    parser.add_argument("--noise_timestep", type=int, default=2)
    parser.add_argument("--layers", type=int, nargs="+", default=list(range(14, 19)))
    parser.add_argument("--num_images", type=int, default=None)
    args = parser.parse_args()

    from conceptattention_tpu import ConceptAttentionFluxPipeline
    from conceptattention_tpu.evals.datasets import (
        VOC_CLASSES,
        VOCSingleClassSegmentation,
        resize_mask_nearest,
    )
    from conceptattention_tpu.evals.metrics import batch_intersection_union
    from conceptattention_tpu.evals.segmentation import FluxMultiClassSegmentationModel
    from conceptattention_tpu.utils.plotting import upsample_nearest

    if not VOCSingleClassSegmentation.available(args.voc_root):
        print(f"VOC dataset not found at {args.voc_root}", file=sys.stderr)
        sys.exit(2)

    dataset = VOCSingleClassSegmentation(args.voc_root)
    pipe = ConceptAttentionFluxPipeline(args.model_name)
    model = FluxMultiClassSegmentationModel(
        pipe, tap="output", num_steps=args.num_steps,
        noise_timestep=args.noise_timestep, layer_indices=args.layers,
        width=args.width, height=args.width,
    )
    concepts = ["background"] + list(VOC_CLASSES)
    nclass = len(concepts)

    total_inter = np.zeros(nclass)
    total_union = np.zeros(nclass)
    n = len(dataset) if args.num_images is None else min(args.num_images, len(dataset))
    for i in range(n):
        image, gt_mask, _ = dataset[i]
        pred_tokens, _ = model.segment_multi_class(image, concepts, "")
        pred = upsample_nearest(
            pred_tokens.astype(np.float64), args.label_size, args.label_size
        ).astype(np.int64)
        label = resize_mask_nearest(
            np.where(gt_mask == 255, 0, gt_mask).astype(np.int64),
            args.label_size, args.label_size,
        )
        inter, union = batch_intersection_union(pred, label, nclass=nclass)
        total_inter += inter
        total_union += union
        present = total_union > 0
        miou = float(np.mean(total_inter[present] / total_union[present]))
        print(f"[{i+1}/{n}] mIoU {miou:.4f}", flush=True)

    present = total_union > 0
    print(f"FINAL mIoU {float(np.mean(total_inter[present] / total_union[present])):.4f}")


if __name__ == "__main__":
    main()
