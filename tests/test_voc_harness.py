"""End-to-end PascalVOC harness tests on a mini VOC fixture — both runners
drive a real flux-tiny model through the full metric loop, and the
single-class runner's resume capability is exercised."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture()
def mini_voc(tmp_path):
    import PIL.Image

    root = tmp_path / "VOC2012"
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    (root / "JPEGImages").mkdir()
    rng = np.random.default_rng(1)
    ids = []
    for i, n_classes in enumerate([1, 2, 1]):
        image_id = f"2007_{i:06d}"
        ids.append(image_id)
        mask = np.zeros((20, 30), np.uint8)
        for c in range(n_classes):
            mask[5 * (c + 1) : 5 * (c + 2)] = c + 3
        PIL.Image.fromarray(mask).save(root / "SegmentationClass" / f"{image_id}.png")
        img = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
        PIL.Image.fromarray(img).save(root / "JPEGImages" / f"{image_id}.jpg")
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text("\n".join(ids))
    return str(root)


def _env():
    return {
        **os.environ, "JAX_PLATFORMS": "cpu",
        "JAX_COMPILATION_CACHE_DIR": "/root/repo/.jax_cache",
    }


def test_single_class_runner_resumes(mini_voc, tmp_path):
    state = str(tmp_path / "voc_state.json")
    base = [
        sys.executable,
        "experiments/pascal_voc_segmentation/run_single_class_split_experiment.py",
        "--voc_root", mini_voc, "--model_name", "flux-tiny",
        "--width", "64", "--label_size", "20", "--num_steps", "2",
        "--noise_timestep", "1", "--layers", "0", "1",
        "--state_path", state,
    ]
    r1 = subprocess.run(base + ["--num_images", "1"],
                        capture_output=True, text=True, timeout=420, env=_env())
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert json.load(open(state))["next_index"] == 1

    r2 = subprocess.run(base + ["--num_images", "2"],
                        capture_output=True, text=True, timeout=420, env=_env())
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resuming from image 1" in r2.stdout
    assert "[2/2]" in r2.stdout and "FINAL" in r2.stdout


def test_multi_class_runner(mini_voc):
    r = subprocess.run(
        [sys.executable,
         "experiments/pascal_voc_segmentation/run_multi_class_seg_experiment.py",
         "--voc_root", mini_voc, "--model_name", "flux-tiny",
         "--width", "64", "--label_size", "20", "--num_steps", "2",
         "--noise_timestep", "1", "--layers", "0", "1", "--num_images", "2"],
        capture_output=True, text=True, timeout=420, env=_env(),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "FINAL mIoU" in r.stdout
