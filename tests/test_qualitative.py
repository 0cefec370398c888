"""Qualitative comparison experiment: smoke the all-method figure script
(reference experiments/all_method_segmentation_qualitative_comparison)."""

import os
import subprocess
import sys

import numpy as np


def test_compare_methods_emits_figure(tmp_path):
    from PIL import Image

    img_path = str(tmp_path / "input.png")
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    ).save(img_path)
    out = str(tmp_path / "cmp.png")
    r = subprocess.run(
        [sys.executable,
         "experiments/qualitative_baseline_comparison/compare_methods.py",
         "--image", img_path, "--caption", "a cat",
         "--concepts", "cat", "sky", "--model_name", "flux-tiny",
         "--width", "64", "--output", out],
        capture_output=True, text=True, timeout=420,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "JAX_COMPILATION_CACHE_DIR": "/root/repo/.jax_cache"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.getsize(out) > 1000
    # all four methods ran
    for name in ("concept_attention", "cross_attention", "value_space", "daam"):
        assert name in r.stdout
