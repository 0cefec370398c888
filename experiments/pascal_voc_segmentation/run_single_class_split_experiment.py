"""PascalVOC single-class zero-shot segmentation.

Parity target: `experiments/pascal_voc_segmentation/
run_single_class_split_experiment.py:54-324` in the reference
(manuragkhullar/ConceptAttention): only images with exactly one foreground
class; the target concept plus background concepts are segmented by argmax /
threshold; pixAcc / mIoU / mAP accumulated. Layers default to 14..18 (the
reference's VOC setting).
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
    parser.add_argument("--tap", default="output")
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--label_size", type=int, default=224)
    parser.add_argument("--num_steps", type=int, default=4)
    parser.add_argument("--noise_timestep", type=int, default=2)
    parser.add_argument("--layers", type=int, nargs="+", default=list(range(14, 19)))
    parser.add_argument("--num_images", type=int, default=None)
    parser.add_argument("--background_concepts", nargs="+",
                        default=["background", "floor", "grass", "tree", "sky"])
    parser.add_argument("--state_path", default=None,
                        help="JSON checkpoint of running metrics; resumes an "
                        "interrupted eval from the next image")
    args = parser.parse_args()

    from conceptattention_tpu import ConceptAttentionFluxPipeline
    from conceptattention_tpu.evals.datasets import (
        VOCSingleClassSegmentation,
        resize_mask_nearest,
    )
    from conceptattention_tpu.evals.metrics import (
        batch_intersection_union,
        batch_pix_accuracy,
        get_ap_scores,
    )
    from conceptattention_tpu.evals.segmentation import FluxTapSegmentationModel
    from conceptattention_tpu.utils.eval_state import SegEvalState
    from conceptattention_tpu.utils.plotting import upsample_nearest

    if not VOCSingleClassSegmentation.available(args.voc_root):
        print(f"VOC dataset not found at {args.voc_root}", file=sys.stderr)
        sys.exit(2)

    dataset = VOCSingleClassSegmentation(args.voc_root)
    pipe = ConceptAttentionFluxPipeline(args.model_name)
    model = FluxTapSegmentationModel(
        pipe, tap=args.tap, num_steps=args.num_steps,
        noise_timestep=args.noise_timestep, layer_indices=args.layers,
        width=args.width, height=args.width,
    )

    st = SegEvalState.load(args.state_path)
    start = st.next_index

    n = len(dataset) if args.num_images is None else min(args.num_images, len(dataset))
    for i in range(start, n):
        image, gt_mask, target = dataset[i]
        concepts = [target] + [c for c in args.background_concepts if c != target]
        masks, coeffs, _ = model(
            [image], target_concepts=[target], concepts=concepts, captions=[target]
        )
        label = resize_mask_nearest(
            (np.logical_and(gt_mask > 0, gt_mask != 255)).astype(np.int64),
            args.label_size, args.label_size,
        )
        pred = (
            upsample_nearest(masks[0].astype(np.float64), args.label_size, args.label_size)
            > 0.5
        ).astype(np.int64)
        coeff = upsample_nearest(
            coeffs[0].astype(np.float64), args.label_size, args.label_size
        )

        correct, labeled = batch_pix_accuracy(pred, label)
        inter, union = batch_intersection_union(pred, label, nclass=2)
        soft = np.stack([1.0 - coeff, coeff])[None]
        st.update(correct, labeled, inter, union,
                  get_ap_scores(soft, label[None]), i + 1)
        print(f"[{i+1}/{n}] {target}: {st.summary()}", flush=True)
        st.save(args.state_path)

    print(f"FINAL {st.summary()}")


if __name__ == "__main__":
    main()
