"""End-to-end ImageNet-Segmentation harness test on a synthetic gtsegs .mat,
including the resume capability the reference harness lacks (it restarts
from image 0 — SURVEY.md §5 checkpoint/resume census)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def _make_mat(path: str, n: int = 3) -> None:
    import h5py

    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        g = f.create_group("value")
        img_refs, gt_refs, name_refs = [], [], []
        for i in range(n):
            img = f.create_dataset(
                f"im{i}",
                data=rng.integers(0, 255, size=(3, 40, 48), dtype=np.uint8),
            )
            mask = f.create_dataset(
                f"m{i}", data=(rng.random((40, 48)) > 0.5).astype(np.uint8)
            )
            gc = f.create_dataset(
                f"gc{i}", data=np.array([[mask.ref]], dtype=h5py.ref_dtype)
            )
            name = f.create_dataset(
                f"nm{i}", data=np.array([ord(c) for c in f"dog-{i}_x"],
                                        dtype=np.uint16),
            )
            img_refs.append(img.ref)
            gt_refs.append(gc.ref)
            name_refs.append(name.ref)
        g.create_dataset("img", data=np.array(img_refs, dtype=h5py.ref_dtype))
        g.create_dataset("gt", data=np.array(gt_refs, dtype=h5py.ref_dtype))
        g.create_dataset("name", data=np.array(name_refs, dtype=h5py.ref_dtype))


def test_harness_runs_and_resumes(tmp_path):
    mat = str(tmp_path / "gtsegs.mat")
    _make_mat(mat)
    state = str(tmp_path / "state.json")
    env = {
        **os.environ, "JAX_PLATFORMS": "cpu",
        "JAX_COMPILATION_CACHE_DIR": "/root/repo/.jax_cache",
    }
    base = [
        sys.executable, "experiments/imagenet_segmentation/run_experiment.py",
        "--mat_path", mat, "--model_name", "flux-tiny",
        "--width", "64", "--label_size", "40", "--num_steps", "2",
        "--noise_timestep", "1", "--layers", "0", "1",
        "--state_path", state,
    ]
    r1 = subprocess.run(base + ["--num_images", "1"],
                        capture_output=True, text=True, timeout=420, env=env)
    assert r1.returncode == 0, r1.stderr[-2000:]
    st = json.load(open(state))
    assert st["next_index"] == 1 and st["labeled"] > 0

    r2 = subprocess.run(base + ["--num_images", "3"],
                        capture_output=True, text=True, timeout=420, env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resuming from image 1" in r2.stdout
    # images 0 already done: only [2/3] and [3/3] printed this run
    assert "[1/3]" not in r2.stdout and "[3/3]" in r2.stdout
    st = json.load(open(state))
    assert st["next_index"] == 3
    assert "FINAL" in r2.stdout


def test_cross_self_ablations_differ(tmp_path):
    """The joint_attention_kwargs ablations (reference
    run_cross_self_ablation.sh) must actually change the maps."""
    import jax.numpy as jnp

    import conceptattention_tpu as cat
    from conceptattention_tpu.evals.segmentation import FluxTapSegmentationModel

    pipe = cat.ConceptAttentionFluxPipeline("flux-tiny", dtype=jnp.float32)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    maps = {}
    for name, (cross, self_) in {
        "both": (True, True), "cross_only": (True, False),
        "self_only": (False, True),
    }.items():
        m = FluxTapSegmentationModel(
            pipe, tap="output", num_steps=2, noise_timestep=1,
            width=64, height=64, layer_indices=[0, 1],
            concept_cross_attention=cross, concept_self_attention=self_,
        )
        coeff, _ = m.segment_individual_image(image, ["cat", "sky"], "a cat")
        maps[name] = coeff
    assert not np.allclose(maps["both"], maps["cross_only"])
    assert not np.allclose(maps["both"], maps["self_only"])
    assert not np.allclose(maps["cross_only"], maps["self_only"])


def test_downscale_flag(tmp_path):
    """--downscale N scores at NxN map granularity (reference
    run_downscale_test.sh 'Chefer-fair' protocol)."""
    mat = str(tmp_path / "gtsegs.mat")
    _make_mat(mat, n=1)
    r = subprocess.run(
        [sys.executable, "experiments/imagenet_segmentation/run_experiment.py",
         "--mat_path", mat, "--model_name", "flux-tiny",
         "--width", "64", "--label_size", "40", "--num_steps", "2",
         "--noise_timestep", "1", "--layers", "0", "1",
         "--downscale", "8", "--num_images", "1"],
        capture_output=True, text=True, timeout=420,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "JAX_COMPILATION_CACHE_DIR": "/root/repo/.jax_cache"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "FINAL" in r.stdout
