"""Dataset loader tests with synthetic fixtures (gtsegs-style .mat, mini VOC)."""

import os

import numpy as np
import pytest

from conceptattention_tpu.evals.datasets import (
    ImagenetSegmentation,
    VOCSingleClassSegmentation,
    resize_mask_nearest,
)


@pytest.fixture()
def synthetic_mat(tmp_path):
    import h5py

    path = str(tmp_path / "gtsegs.mat")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        g = f.create_group("value")
        img_refs, gt_refs, name_refs = [], [], []
        for i in range(3):
            # images stored channel-first + transposed (C, W, H) like the mat
            img = f.create_dataset(
                f"im{i}", data=rng.integers(0, 255, (3, 32, 24), dtype=np.uint8)
            )
            img_refs.append(img.ref)
            mask = f.create_dataset(
                f"mk{i}", data=(rng.random((32, 24)) > 0.5).astype(np.uint8)
            )
            cell = f.create_dataset(
                f"gc{i}", data=np.array([[mask.ref]], dtype=h5py.ref_dtype)
            )
            gt_refs.append(cell.ref)
            name = f.create_dataset(
                f"nm{i}",
                data=np.array([ord(c) for c in f"goldfish_{i}"], dtype=np.uint16),
            )
            name_refs.append(name.ref)
        g.create_dataset("img", data=np.array(img_refs, dtype=h5py.ref_dtype))
        g.create_dataset("gt", data=np.array(gt_refs, dtype=h5py.ref_dtype))
        g.create_dataset("name", data=np.array(name_refs, dtype=h5py.ref_dtype))
    return path


class TestImagenetSegmentation:
    def test_preprocess_and_load(self, synthetic_mat):
        assert ImagenetSegmentation.available(synthetic_mat)
        ds = ImagenetSegmentation(synthetic_mat)
        assert len(ds) == 3
        img, mask, name = ds[0]
        assert img.shape == (24, 32, 3)
        assert mask.shape == (24, 32)
        assert set(np.unique(mask)) <= {0, 1}
        assert name.startswith("goldfish")

    def test_cache_reused(self, synthetic_mat):
        ds1 = ImagenetSegmentation(synthetic_mat)
        # second instantiation must read the cache, not re-preprocess
        ds2 = ImagenetSegmentation(synthetic_mat)
        assert ds1.rows == ds2.rows


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
            mask[5 * (c + 1) : 5 * (c + 2)] = c + 3  # classes 3, 4
        PIL.Image.fromarray(mask).save(root / "SegmentationClass" / f"{image_id}.png")
        img = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
        PIL.Image.fromarray(img).save(root / "JPEGImages" / f"{image_id}.jpg")
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text("\n".join(ids))
    return str(root)


class TestVOC:
    def test_single_class_filter(self, mini_voc):
        assert VOCSingleClassSegmentation.available(mini_voc)
        ds = VOCSingleClassSegmentation(mini_voc)
        assert len(ds) == 2  # only the single-fg-class images
        img, mask, target = ds[0]
        assert img.shape == (20, 30, 3)
        assert target == "bird"  # VOC class id 3 -> VOC_CLASSES[2]


def test_resize_mask_nearest():
    mask = np.arange(6).reshape(2, 3)
    out = resize_mask_nearest(mask, 4, 6)
    assert out.shape == (4, 6)
    assert set(np.unique(out)) <= set(range(6))
