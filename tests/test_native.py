"""Native (C++) eval-ops vs numpy reference implementations."""

import numpy as np
import pytest

from conceptattention_tpu import native
from conceptattention_tpu.evals.metrics import batch_intersection_union, batch_pix_accuracy
from conceptattention_tpu.evals.segmentation import gaussian_blur_3x3
from conceptattention_tpu.utils.plotting import upsample_nearest


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++)")
    return lib


def test_nearest_resize_matches_numpy(lib):
    rng = np.random.default_rng(0)
    src = rng.standard_normal((17, 23)).astype(np.float32)
    got = native.nearest_resize(src, 64, 48)
    want = upsample_nearest(src, 64, 48)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_hist_iou_matches_numpy(lib):
    rng = np.random.default_rng(1)
    pred = rng.integers(0, 3, size=(50, 50))
    target = rng.integers(0, 3, size=(50, 50))
    inter_n, uni_n = batch_intersection_union(pred, target, 3)
    inter_c, uni_c = native.hist_iou(pred, target, 3)
    np.testing.assert_array_equal(inter_c, inter_n)
    np.testing.assert_array_equal(uni_c, uni_n)


def test_pix_acc_matches_numpy(lib):
    rng = np.random.default_rng(2)
    pred = rng.integers(0, 2, size=(64, 64))
    target = rng.integers(0, 2, size=(64, 64))
    assert native.pix_acc(pred, target) == batch_pix_accuracy(pred, target)


def test_gaussian_blur_close_to_numpy(lib):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((16, 16)).astype(np.float32)
    got = native.gaussian_blur3(x, sigma=1.0)
    want = gaussian_blur_3x3(x, sigma=1.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
