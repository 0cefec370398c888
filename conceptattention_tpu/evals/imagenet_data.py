"""ImageNet classification data path for the perturbation evaluation.

Capability parity with the reference's vendored loaders
(manuragkhullar/ConceptAttention,
`chefer_vit_explainability/data/imagenet.py:1-200` — torchvision
`ImageNet`/HDF5 wrappers — and `data/imagenet_utils.py` — the CLS2IDX class
table): a folder dataset that yields (image, class_index) pairs for the
Chefer perturbation AUC experiment (`pertubation_eval_from_hdf5.py:25-232`).

TPU-first: no torch DataLoader; images load host-side with PIL/numpy and the
experiment batches them into one jitted (steps x batch) classification sweep
(evals/perturbation.py).

Layout: the standard ImageFolder scheme `root/<class_dir>/<image>` with class
directories in SORTED order defining the class index — for a real ImageNet
val split the sorted-WNID order IS the canonical ILSVRC-2012 index order, so
`IMAGENET_CLASSES[idx]` names each class. Any subset of classes works (e.g.
a synthetic test fixture): indices follow the sorted present directories
unless an explicit `class_to_idx` mapping is given.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from conceptattention_tpu.evals.imagenet_classes import IMAGENET_CLASSES

_IMAGE_EXTS = (".jpeg", ".jpg", ".png", ".bmp", ".webp")


def imagenet_class_name(idx: int) -> str:
    return IMAGENET_CLASSES[idx]


class ImageNetFolder:
    """`root/<class_dir>/<image>` -> (np.uint8 HWC image, class index)."""

    def __init__(
        self,
        root: str,
        class_to_idx: Optional[Dict[str, int]] = None,
        loader: Optional[Callable] = None,
    ):
        if not os.path.isdir(root):
            raise FileNotFoundError(f"ImageNet folder not found: {root}")
        dirs = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        if not dirs:
            raise FileNotFoundError(f"no class directories under {root}")
        self.class_to_idx = (
            dict(class_to_idx) if class_to_idx is not None
            else {d: i for i, d in enumerate(dirs)}
        )
        self.samples: List[Tuple[str, int]] = []
        for d in dirs:
            if d not in self.class_to_idx:
                continue
            idx = self.class_to_idx[d]
            cdir = os.path.join(root, d)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(_IMAGE_EXTS):
                    self.samples.append((os.path.join(cdir, fname), idx))
        if not self.samples:
            raise FileNotFoundError(f"no images under {root}")
        self._loader = loader or self._default_loader

    @staticmethod
    def _default_loader(path: str) -> np.ndarray:
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"))

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, int]:
        path, idx = self.samples[i]
        return self._loader(path), idx

    @staticmethod
    def available(root: str) -> bool:
        try:
            ImageNetFolder(root)
            return True
        except FileNotFoundError:
            return False
