"""Segmentation evaluation datasets: ImageNet-Segmentation and PascalVOC.

Capability parity with the reference's loaders
(`experiments/imagenet_segmentation/data_processing.py:25-116` — h5py
preprocessing of gtsegs_ijcv.mat into PNG/CSV caches — and the vendored
`chefer_vit_explainability/data/VOC.py:52-230` in
manuragkhullar/ConceptAttention). Both are gated on local data presence (this
environment has no download egress); `available()` lets harnesses skip
gracefully.
"""

from __future__ import annotations

import csv
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


class ImagenetSegmentation:
    """gtsegs_ijcv.mat -> (image, binary mask) pairs.

    First access preprocesses the .mat (HDF5 object references) into a
    PNG+CSV cache directory, mirroring the reference's one-time conversion.
    """

    def __init__(self, mat_path: str, cache_dir: Optional[str] = None):
        self.mat_path = mat_path
        self.cache_dir = cache_dir or os.path.join(
            os.path.dirname(mat_path) or ".", "imagenet_seg_cache"
        )
        self.index_csv = os.path.join(self.cache_dir, "index.csv")
        if not os.path.exists(self.index_csv):
            self._preprocess()
        with open(self.index_csv) as f:
            self.rows = list(csv.DictReader(f))

    @staticmethod
    def available(mat_path: str) -> bool:
        return os.path.exists(mat_path)

    def _preprocess(self) -> None:
        import h5py
        import PIL.Image

        os.makedirs(self.cache_dir, exist_ok=True)
        rows = []
        with h5py.File(self.mat_path, "r") as f:
            images_refs = f["value"]["img"]
            gts_refs = f["value"]["gt"]
            names_refs = f["value"]["name"]
            n = images_refs.shape[0] if images_refs.ndim == 1 else images_refs.shape[1]
            for i in range(n):
                img_ref = images_refs[i] if images_refs.ndim == 1 else images_refs[0, i]
                gt_ref = gts_refs[i] if gts_refs.ndim == 1 else gts_refs[0, i]
                name_ref = names_refs[i] if names_refs.ndim == 1 else names_refs[0, i]
                img = np.asarray(f[img_ref]).transpose(2, 1, 0)  # -> HWC
                gt = np.asarray(f[f[gt_ref][0, 0]]).T
                name_arr = np.asarray(f[name_ref]).ravel()
                name = "".join(chr(c) for c in name_arr)
                img_path = os.path.join(self.cache_dir, f"{i:05d}.png")
                mask_path = os.path.join(self.cache_dir, f"{i:05d}_mask.png")
                PIL.Image.fromarray(img.astype(np.uint8)).save(img_path)
                PIL.Image.fromarray((gt > 0).astype(np.uint8) * 255).save(mask_path)
                rows.append({"image": img_path, "mask": mask_path, "name": name})
        with open(self.index_csv, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["image", "mask", "name"])
            writer.writeheader()
            writer.writerows(rows)

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray, str]:
        import PIL.Image

        row = self.rows[idx]
        img = np.asarray(PIL.Image.open(row["image"]).convert("RGB"))
        mask = (np.asarray(PIL.Image.open(row["mask"])) > 0).astype(np.int64)
        return img, mask, row["name"]


class VOCSingleClassSegmentation:
    """PascalVOC val images that contain exactly one foreground class
    (parity with run_single_class_split_experiment.py:40-52)."""

    def __init__(self, voc_root: str, split: str = "val"):
        self.voc_root = voc_root
        split_file = os.path.join(
            voc_root, "ImageSets", "Segmentation", f"{split}.txt"
        )
        with open(split_file) as f:
            ids = [line.strip() for line in f if line.strip()]
        self.items: List[Tuple[str, int]] = []
        for image_id in ids:
            mask = self._load_mask(image_id)
            classes = np.unique(mask)
            fg = classes[(classes > 0) & (classes < 255)]
            if len(fg) == 1:
                self.items.append((image_id, int(fg[0])))

    @staticmethod
    def available(voc_root: str) -> bool:
        return os.path.exists(os.path.join(voc_root, "ImageSets", "Segmentation"))

    def _load_mask(self, image_id: str) -> np.ndarray:
        import PIL.Image

        path = os.path.join(self.voc_root, "SegmentationClass", f"{image_id}.png")
        return np.asarray(PIL.Image.open(path))

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray, str]:
        import PIL.Image

        image_id, class_idx = self.items[idx]
        img_path = os.path.join(self.voc_root, "JPEGImages", f"{image_id}.jpg")
        img = np.asarray(PIL.Image.open(img_path).convert("RGB"))
        mask = self._load_mask(image_id)
        return img, mask, VOC_CLASSES[class_idx - 1]


class VOCMultiClassSegmentation:
    """ALL PascalVOC split images with their full class masks and present
    foreground class names (the reference's multi-class harness runs the full
    VOCSegmentation split and builds each image's concept vocabulary from its
    present classes — run_multi_class_seg_experiment.py:144-157)."""

    def __init__(self, voc_root: str, split: str = "val"):
        self.voc_root = voc_root
        split_file = os.path.join(
            voc_root, "ImageSets", "Segmentation", f"{split}.txt"
        )
        with open(split_file) as f:
            self.ids = [line.strip() for line in f if line.strip()]

    @staticmethod
    def available(voc_root: str) -> bool:
        return os.path.exists(os.path.join(voc_root, "ImageSets", "Segmentation"))

    def _load_mask(self, image_id: str) -> np.ndarray:
        import PIL.Image

        path = os.path.join(self.voc_root, "SegmentationClass", f"{image_id}.png")
        return np.asarray(PIL.Image.open(path))

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray, List[str]]:
        import PIL.Image

        image_id = self.ids[idx]
        img_path = os.path.join(self.voc_root, "JPEGImages", f"{image_id}.jpg")
        img = np.asarray(PIL.Image.open(img_path).convert("RGB"))
        mask = self._load_mask(image_id)
        classes = np.unique(mask)
        fg = classes[(classes > 0) & (classes < 255)]
        present = [VOC_CLASSES[c - 1] for c in fg]
        return img, mask, present


def resize_mask_nearest(mask: np.ndarray, height: int, width: int) -> np.ndarray:
    h, w = mask.shape
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return mask[rows][:, cols]
