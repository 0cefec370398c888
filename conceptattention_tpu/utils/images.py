"""Shared image-ingestion helpers.

The reference scales inputs with value-range heuristics scattered per caller
(e.g. ``if arr.max() > 1.5: arr /= 255`` — which mis-scales an all-dark uint8
image whose max is <= 1). Every ingestion path here routes through one
dtype-branching helper instead: integer arrays (uint8 PIL images) are
byte-valued and divided by 255; float arrays are trusted as [0, 1].
"""

from __future__ import annotations

import numpy as np


def as_float01_chw(image) -> np.ndarray:
    """PIL image / HWC / CHW array -> float32 CHW array in [0, 1].

    Branches on the *dtype*, not the value range: a dark uint8 image with all
    pixels <= 1 still gets divided by 255, and a float image that happens to
    contain values > 1.5 is left alone (garbage in, garbage out — but never
    silently rescaled).
    """
    raw = np.asarray(image)
    is_int = np.issubdtype(raw.dtype, np.integer)
    arr = raw.astype(np.float32)
    if arr.ndim == 3 and arr.shape[-1] in (3, 4):
        arr = arr[..., :3].transpose(2, 0, 1)  # HWC -> CHW
    if is_int:
        arr = arr / 255.0
    return arr
