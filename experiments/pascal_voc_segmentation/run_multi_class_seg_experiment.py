"""PascalVOC multi-class zero-shot segmentation via concept argmax.

Parity target: `experiments/pascal_voc_segmentation/
run_multi_class_seg_experiment.py:39-279` in the reference
(manuragkhullar/ConceptAttention): the FULL VOC split (multi-class images
included), each image's concept vocabulary = background concepts + the
classes PRESENT in that image (reference :144-157), per-pixel argmax mapped
back to VOC class ids (:27-35), and the reference's metric loop — per-image
mIoU over classes with nonzero union plus running dataset-level mIoU and
pixel accuracy (:205-233; border/ignore pixels stay 255 and score as errors,
exactly like the reference's labels).
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
    parser.add_argument("--background_concepts", nargs="+",
                        default=["background", "floor", "grass", "tree", "sky"])
    args = parser.parse_args()

    from conceptattention_tpu import ConceptAttentionFluxPipeline
    from conceptattention_tpu.evals.datasets import (
        VOC_CLASSES,
        VOCMultiClassSegmentation,
        resize_mask_nearest,
    )
    from conceptattention_tpu.evals.metrics import batch_pix_accuracy
    from conceptattention_tpu.evals.segmentation import FluxMultiClassSegmentationModel
    from conceptattention_tpu.utils.plotting import upsample_nearest

    if not VOCMultiClassSegmentation.available(args.voc_root):
        print(f"VOC dataset not found at {args.voc_root}", file=sys.stderr)
        sys.exit(2)

    dataset = VOCMultiClassSegmentation(args.voc_root)
    pipe = ConceptAttentionFluxPipeline(args.model_name)
    model = FluxMultiClassSegmentationModel(
        pipe, tap="output", num_steps=args.num_steps,
        noise_timestep=args.noise_timestep, layer_indices=args.layers,
        width=args.width, height=args.width,
    )
    bg = list(args.background_concepts)
    n_voc = len(VOC_CLASSES) + 1  # 21 incl. background

    total_inter = np.zeros(n_voc)
    total_union = np.zeros(n_voc)
    total_correct = 0
    total_label = 0
    n = len(dataset) if args.num_images is None else min(args.num_images, len(dataset))
    done = 0
    for i in range(n):
        image, gt_mask, present = dataset[i]
        if not present:  # background-only image: nothing to segment
            continue
        done += 1
        # Concepts = background concepts then THIS image's present classes
        # (reference :177: "Must be background then present classes").
        concepts = bg + present
        caption = ",".join(f"a {c}" for c in present)
        pred_tokens, _ = model.segment_multi_class(image, concepts, caption)
        pred = upsample_nearest(
            pred_tokens.astype(np.float64), args.label_size, args.label_size
        ).astype(np.int64)
        # Map argmax indices back to VOC ids: any background concept -> 0,
        # present-class slots -> their VOC class index (reference :27-35).
        remapped = np.zeros_like(pred)
        for j, cname in enumerate(present):
            remapped[pred == len(bg) + j] = VOC_CLASSES.index(cname) + 1
        # Labels keep the 255 ignore/border pixels — the reference scores
        # them (never matched by any class prediction).
        label = resize_mask_nearest(
            gt_mask.astype(np.int64), args.label_size, args.label_size
        )

        correct, labeled = batch_pix_accuracy(remapped, label)
        total_correct += correct
        total_label += labeled
        img_miou, img_classes = 0.0, 0
        for c in range(n_voc):
            inter = int(np.sum((remapped == c) & (label == c)))
            union = int(np.sum((remapped == c) | (label == c)))
            total_inter[c] += inter
            total_union[c] += union
            if union == 0:
                continue
            img_classes += 1
            img_miou += inter / union
        img_miou /= img_classes + 1e-6

        nz = total_union > 0
        run_miou = float(np.mean(total_inter[nz] / total_union[nz]))
        pix_acc = total_correct / (total_label + 1e-6)
        print(f"[{done}] {dataset.ids[i]}: img mIoU {img_miou:.4f} "
              f"running mIoU {run_miou:.4f} pixAcc {pix_acc:.4f}", flush=True)

    nz = total_union > 0
    print(f"FINAL mIoU {float(np.mean(total_inter[nz] / total_union[nz])):.4f} "
          f"pixAcc {total_correct / (total_label + 1e-6):.4f}")


if __name__ == "__main__":
    main()
