"""ImageNet-Segmentation zero-shot evaluation harness.

Parity target: `experiments/imagenet_segmentation/run_experiment.py:31-256` in
the reference (manuragkhullar/ConceptAttention): per-image binary segmentation
with pixAcc / mIoU / mAP accumulation and running prints. Protocol constants
match the reference (512^2 input, 224^2 labels, token-grid maps upsampled
nearest-neighbor, mean-value threshold, layers 14..17, noise timestep 2/4).

Usage:
  python experiments/imagenet_segmentation/run_experiment.py \
      --mat_path /data/gtsegs_ijcv.mat --model_name flux-schnell \
      --tap output --num_images 100

`--segmentation_model` selects any of the reference's 13 baselines
(evals/model_zoo.py; ViT/UNet/CLIP baselines need their env-var checkpoint
paths, or --random_weights for a smoke run). The default RawOutputSpace +
`--tap` preserves the flux-tap shortcut.
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
    parser.add_argument("--mat_path", required=True)
    parser.add_argument("--model_name", default="flux-schnell")
    parser.add_argument("--segmentation_model", default=None,
                        help="any evals/model_zoo.py choice (13 baselines); "
                        "default: flux tap per --tap")
    parser.add_argument("--random_weights", action="store_true",
                        help="smoke-run non-flux baselines without checkpoints")
    parser.add_argument(
        "--tap", default="output", choices=["output", "cross_attention", "value"]
    )
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--label_size", type=int, default=224)
    parser.add_argument("--num_steps", type=int, default=4)
    parser.add_argument("--noise_timestep", type=int, default=2)
    parser.add_argument("--layers", type=int, nargs="+", default=list(range(14, 18)))
    parser.add_argument("--softmax", action="store_true")
    parser.add_argument("--apply_blur", action="store_true")
    # joint_attention_kwargs ablations (reference run_cross_self_ablation.sh)
    parser.add_argument("--concept_cross_attention",
                        action=argparse.BooleanOptionalAction, default=True)
    parser.add_argument("--concept_self_attention",
                        action=argparse.BooleanOptionalAction, default=True)
    # "Chefer-fair" downscale test (reference run_downscale_test.sh +
    # run_experiment.py:179-190): ONLY the soft coefficients (the mAP input)
    # pass through the NxN bottleneck (ViT token resolution, 14) so all
    # methods are scored at the same map granularity; the binary mask keeps
    # the full-resolution threshold, exactly as the reference does.
    parser.add_argument("--downscale", type=int, default=None)
    parser.add_argument("--num_images", type=int, default=None)
    parser.add_argument("--image_batch", type=int, default=1,
                        help="flux taps only: VAE-encode + stopped-forward "
                        "this many images per dispatch (segment_batch; "
                        "output-identical to per-image, ~2.9x lower "
                        "marginal cost per image on-chip — bench.py "
                        "--encode). Images whose concept-list length "
                        "differs start a new batch.")
    parser.add_argument("--background_concepts", nargs="+",
                        default=["background", "floor", "grass", "tree", "sky"])
    parser.add_argument("--state_path", default=None,
                        help="JSON checkpoint of running metrics; an "
                        "interrupted run resumes from the next image instead "
                        "of image 0 (the reference harness always restarts)")
    args = parser.parse_args()

    from conceptattention_tpu import ConceptAttentionFluxPipeline
    from conceptattention_tpu.evals.datasets import ImagenetSegmentation
    from conceptattention_tpu.evals.metrics import (
        batch_intersection_union,
        batch_pix_accuracy,
        get_ap_scores,
    )
    from conceptattention_tpu.evals.model_zoo import build_segmentation_model
    from conceptattention_tpu.evals.segmentation import FluxTapSegmentationModel
    from conceptattention_tpu.utils.eval_state import SegEvalState
    from conceptattention_tpu.utils.plotting import upsample_nearest

    if not ImagenetSegmentation.available(args.mat_path):
        print(f"dataset not found at {args.mat_path}", file=sys.stderr)
        sys.exit(2)

    dataset = ImagenetSegmentation(args.mat_path)
    if args.segmentation_model and args.segmentation_model not in (
        "RawOutputSpace", "RawCrossAttention", "RawValueSpace", "DAAMFlux"
    ):
        # Non-flux baseline from the zoo (checkpoints via env vars).
        model = build_segmentation_model(
            args.segmentation_model, random_weights=args.random_weights
        )
    else:
        pipe = ConceptAttentionFluxPipeline(args.model_name)
        tap = {
            "RawOutputSpace": "output",
            "RawCrossAttention": "cross_attention",
            "RawValueSpace": "value",
            None: args.tap,
        }.get(args.segmentation_model, args.tap)
        if args.segmentation_model == "DAAMFlux":
            model = build_segmentation_model(
                "DAAMFlux", pipeline=pipe, num_steps=args.num_steps,
                noise_timestep=args.noise_timestep, layer_indices=args.layers,
                width=args.width, height=args.width,
            )
        else:
            model = FluxTapSegmentationModel(
                pipe, tap=tap, num_steps=args.num_steps,
                noise_timestep=args.noise_timestep, layer_indices=args.layers,
                softmax=args.softmax, width=args.width, height=args.width,
                concept_cross_attention=args.concept_cross_attention,
                concept_self_attention=args.concept_self_attention,
            )

    st = SegEvalState.load(args.state_path)
    start = st.next_index

    n = len(dataset) if args.num_images is None else min(args.num_images, len(dataset))
    constant_maps = 0  # degenerate (constant) coefficient maps seen

    def concepts_for(target):
        return [target] + [
            c for c in args.background_concepts if c != target
        ]

    def score_one(i, name, gt_mask, masks, coeffs):
        nonlocal constant_maps
        # Min-max rescale of the soft coefficients BEFORE AP scoring
        # (reference run_experiment.py:177-178). Not rank-invariant here:
        # get_ap_scores flattens the {bg=1-c, fg=c} channels together, so
        # cross-channel ordering — and therefore mAP — depends on the map's
        # absolute scale (tests/test_seg_protocol_parity.py pins this).
        c = np.asarray(coeffs[0], np.float64)
        denom = c.max() - c.min()
        if denom > 0:
            coeffs[0] = (c - c.min()) / denom
        else:
            # The reference propagates NaN here; substituting zeros keeps the
            # run alive but AP then scores bg-everywhere — surface it so a
            # degenerate method output is visible in the log, not silent.
            constant_maps += 1
            print(f"WARNING: constant coefficient map for image {i} "
                  f"({name}); scoring as all-background", flush=True)
            coeffs[0] = np.zeros_like(c)
        if args.downscale:
            # soft coefficients only — pixAcc/mIoU keep the full-res mask
            d = args.downscale
            coeffs[0] = np.asarray(
                upsample_nearest(coeffs[0].astype(np.float64), d, d)
            )
        # Upsample token-grid prediction to label resolution
        label = (gt_mask > 0).astype(np.int64)
        label224 = label if label.shape == (args.label_size,) * 2 else (
            upsample_nearest(label.astype(np.float64), args.label_size, args.label_size) > 0.5
        ).astype(np.int64)
        pred = (
            upsample_nearest(masks[0].astype(np.float64), args.label_size, args.label_size)
            > 0.5
        ).astype(np.int64)
        coeff224 = upsample_nearest(
            coeffs[0].astype(np.float64), args.label_size, args.label_size
        )

        # The reference scores the STACKED {bg=1-m, fg=m} pair
        # (run_experiment.py:203-215), not plain class maps. For pixAcc the
        # pair form only doubles both counts (same ratio), but for IoU it is
        # a DIFFERENT statistic — both histogram bins become
        # (TP+TN)/(2N-TP-TN) — so reference-mIoU parity requires the pair
        # (tests/test_seg_protocol_parity.py::test_metrics_protocol_parity).
        pred_pair = np.stack([1 - pred, pred])
        label_pair = np.stack([1 - label224, label224])
        correct, labeled = batch_pix_accuracy(pred_pair, label_pair)
        inter, union = batch_intersection_union(pred_pair, label_pair, nclass=2)
        # soft AP over {bg, fg} channels
        soft = np.stack([1.0 - coeff224, coeff224])[None]
        st.update(correct, labeled, inter, union,
                  get_ap_scores(soft, label224[None]), i + 1)
        print(f"[{i+1}/{n}] {name}: {st.summary()}", flush=True)
        st.save(args.state_path)

    batched = args.image_batch > 1 and type(model) is FluxTapSegmentationModel
    if args.image_batch > 1 and not batched:
        print("WARNING: --image_batch applies only to the flux taps "
              "(RawOutputSpace/RawCrossAttention/RawValueSpace); running "
              "per-image", flush=True)
    i = start
    while i < n:
        if batched:
            # Group consecutive images sharing a concept-list length into one
            # segment_batch dispatch (output-identical to per-image;
            # tests/test_seg_batch.py).
            group = []
            while i < n and len(group) < args.image_batch:
                image, gt_mask, name = dataset[i]
                target = name.split("_")[0].replace("-", " ")
                cl = concepts_for(target)
                if group and len(cl) != len(group[0][4]):
                    break
                group.append((i, name, gt_mask, image, cl, target))
                i += 1
            masks, coeffs, _ = model.segment_batch(
                [g[3] for g in group],
                target_concepts=[g[5] for g in group],
                concepts_list=[g[4] for g in group],
                captions=[g[5] for g in group],
                apply_blur=args.apply_blur,
            )
            for j, (gi, name, gt_mask, _, _, _) in enumerate(group):
                score_one(gi, name, gt_mask, masks[j:j + 1], coeffs[j:j + 1])
        else:
            image, gt_mask, name = dataset[i]
            target = name.split("_")[0].replace("-", " ")
            masks, coeffs, _ = model(
                [image], target_concepts=[target],
                concepts=concepts_for(target), captions=[target],
                apply_blur=args.apply_blur,
            )
            score_one(i, name, gt_mask, masks, coeffs)
            i += 1

    if constant_maps:
        print(f"WARNING: {constant_maps} constant coefficient map(s) were "
              f"scored as all-background")
    print(f"FINAL {st.summary()}")


if __name__ == "__main__":
    main()
