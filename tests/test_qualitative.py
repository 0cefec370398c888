"""Qualitative comparison experiment: smoke the all-method figure script
(reference experiments/all_method_segmentation_qualitative_comparison/
compare_each_method.py — DINO, TextSpan, Chefer variants next to the flux
taps; every method resolves through evals.model_zoo)."""

import os
import subprocess
import sys

import numpy as np

from conceptattention_tpu.evals.model_zoo import MODEL_CHOICES


def test_compare_methods_all_15_emits_figure(tmp_path):
    from PIL import Image

    img_path = str(tmp_path / "input.png")
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    ).save(img_path)
    out = str(tmp_path / "cmp.png")
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "JAX_COMPILATION_CACHE_DIR": "/root/repo/.jax_cache"}
    # No env-var checkpoints may leak into the smoke run: --random_weights
    # must drive every family.
    for var in ("CHEFER_VITB16", "DINO_VITB16", "SD2_UNET", "SDXL_UNET",
                "OPENCLIP_VITH14"):
        env.pop(var, None)
    r = subprocess.run(
        [sys.executable,
         "experiments/qualitative_baseline_comparison/compare_methods.py",
         "--image", img_path, "--caption", "a cat",
         "--concepts", "cat", "sky", "--model_name", "flux-tiny",
         "--width", "64", "--methods", "all", "--random_weights", "--tiny",
         "--hard_masks", "--output", out],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.getsize(out) > 1000
    # all 15 methods ran and the figure counts them
    for name in MODEL_CHOICES:
        assert f"{name}:" in r.stdout
    assert "15 methods" in r.stdout


def test_unknown_method_rejected_before_model_load(tmp_path):
    from PIL import Image

    img_path = str(tmp_path / "input.png")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_path)
    r = subprocess.run(
        [sys.executable,
         "experiments/qualitative_baseline_comparison/compare_methods.py",
         "--image", img_path, "--concepts", "cat",
         "--methods", "NotAMethod", "--output", str(tmp_path / "x.png")],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode != 0
    assert "NotAMethod" in r.stderr
