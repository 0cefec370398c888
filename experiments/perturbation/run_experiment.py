"""Positive/negative perturbation AUC experiment over the 7 Chefer methods.

Parity target: `chefer_vit_explainability/pertubation_eval_from_hdf5.py:25-232`
+ `data/imagenet.py` in the reference (manuragkhullar/ConceptAttention): for
each explanation method, mask the top-k fraction of pixels (most-relevant
first = positive test; least-relevant first = negative) at steps 0.1..0.9,
re-classify, and report the accuracy AUC. Faithful explanations have LOW
positive AUC and HIGH negative AUC.

TPU-first differences: no HDF5 staging of precomputed visualizations — the
relevance maps come from the in-process JAX methods and the whole
(9 steps x batch) sweep is one jitted classification batch.

Usage:
    python run_experiment.py --imagenet_dir /path/to/val \
        --num_images 500 --methods transformer_attribution gradcam rollout

Weights: --ckpt (a ViT-B/16 .npz/safetensors ingested by
convert_vit_state_dict) or the CHEFER_VITB16 env var (the same
variable model_zoo.py and CLAUDE.md document for this checkpoint); random
init otherwise
(smoke-testing the harness only — AUCs are then meaningless).
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", ".."))
)

import argparse
import csv

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--imagenet_dir", required=True,
                        help="ImageFolder layout: root/<class_dir>/<image>")
    parser.add_argument("--methods", nargs="+", default=None,
                        help="subset of the 7 Chefer methods (default: all)")
    parser.add_argument("--num_images", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--vis_class", default="top", choices=["top", "target"],
                        help="class the explanation is computed for "
                        "(reference --vis-class: predicted vs ground truth)")
    parser.add_argument("--ckpt", default=_os.environ.get("CHEFER_VITB16", _os.environ.get("VIT_B16", "")))
    parser.add_argument("--image_size", type=int, default=224)
    # ViT architecture overrides (ViT-B/16 defaults); the test fixture uses a
    # tiny tower so the smoke run does not compile a 12-layer LRP graph.
    parser.add_argument("--vit_depth", type=int, default=12)
    parser.add_argument("--vit_hidden", type=int, default=768)
    parser.add_argument("--vit_heads", type=int, default=12)
    parser.add_argument("--vit_patch", type=int, default=16)
    parser.add_argument("--vit_classes", type=int, default=1000)
    parser.add_argument("--output_csv", default="perturbation_auc.csv")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from conceptattention_tpu.evals.baselines import _preprocess
    from conceptattention_tpu.evals.imagenet_data import ImageNetFolder
    from conceptattention_tpu.evals.perturbation import (
        CHEFER_METHODS,
        compute_vit_relevance,
        run_perturbation_eval,
        upsample_token_relevance,
    )
    from conceptattention_tpu.models.vit import ViTConfig, init_vit_params, vit_forward

    methods = args.methods or list(CHEFER_METHODS)
    bad = [m for m in methods if m not in CHEFER_METHODS]
    if bad:
        print(f"unknown methods {bad}; choose from {list(CHEFER_METHODS)}",
              file=_sys.stderr)
        _sys.exit(2)

    dataset = ImageNetFolder(args.imagenet_dir)
    n = min(args.num_images, len(dataset))
    cfg = ViTConfig(
        image_size=args.image_size, patch_size=args.vit_patch,
        hidden_size=args.vit_hidden, depth=args.vit_depth,
        num_heads=args.vit_heads, num_classes=args.vit_classes,
    )
    if args.ckpt:
        from conceptattention_tpu.weights.convert import (
            convert_vit_state_dict,
            load_safetensors,
        )

        params = convert_vit_state_dict(load_safetensors(args.ckpt), cfg)
    else:
        print("WARNING: no --ckpt / CHEFER_VITB16 checkpoint — random weights, "
              "AUCs are a harness smoke test only", file=_sys.stderr)
        params = init_vit_params(jax.random.PRNGKey(0), cfg)

    classify = jax.jit(lambda x: vit_forward(params, cfg, x)[0])

    # Batch the images once; relevance + the 9-step sweep run per method.
    # Image decode + preprocessing runs on a background thread pool
    # (utils/data.py) so the host never serializes PIL decodes.
    from conceptattention_tpu.utils.data import PrefetchIterator, batched_indices

    def load(idx):
        imgs, labels = zip(*(dataset[i] for i in idx))
        x = jnp.concatenate([_preprocess(im, args.image_size) for im in imgs])
        return x, jnp.asarray(labels)

    idx_stream = (
        idx for idx in batched_indices(n, args.batch_size)
    )
    batches = list(PrefetchIterator(idx_stream, load, num_threads=4))

    rows = []
    for method in methods:
        accs = {False: [], True: []}
        weights = []
        for x, labels in batches:
            index = None
            if args.vis_class == "target":
                index = labels
            rel = compute_vit_relevance(params, cfg, x, method, index=index)
            if rel.shape[-1] != args.image_size:  # token map -> pixel map
                rel = upsample_token_relevance(rel, args.image_size)
            # The reference zeroes UNNORMALIZED pixels then normalizes
            # (pertubation_eval:90-96): on normalized inputs the equivalent
            # masked value is -mean/std per channel.
            mean = np.array([0.485, 0.456, 0.406], np.float32)
            std = np.array([0.229, 0.224, 0.225], np.float32)
            for negative in (False, True):
                res = run_perturbation_eval(
                    classify, x, labels, rel, negative=negative,
                    fill=-mean / std,
                )
                accs[negative].append(res.accuracy)
            weights.append(x.shape[0])
        w = np.asarray(weights, np.float64)[:, None]
        for negative in (False, True):
            acc = (np.stack(accs[negative]) * w).sum(0) / w.sum()
            trapezoid = getattr(np, "trapezoid", None) or np.trapz
            auc = float(trapezoid(acc, np.linspace(0.1, 0.9, 9)))
            mode = "negative" if negative else "positive"
            rows.append([method, mode, auc] + [float(a) for a in acc])
            print(f"{method:26s} {mode:8s} AUC {auc:.4f}", flush=True)

    with open(args.output_csv, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(
            ["method", "mode", "auc"] + [f"acc@{s:.1f}" for s in np.linspace(0.1, 0.9, 9)]
        )
        writer.writerows(rows)
    print(f"wrote {args.output_csv} ({n} images, vis_class={args.vis_class})")


if __name__ == "__main__":
    main()
