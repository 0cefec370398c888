"""Heatmap visualization helpers.

Capability parity with `concept_attention/plotting.py:8-178` in the reference
(manuragkhullar/ConceptAttention): heatmap-on-image overlays, per-concept
heatmap grids, and coefficient maps — generalized to any token-grid size
instead of the reference's hardcoded 64x64.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def _to_numpy_image(image) -> np.ndarray:
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    return arr


def upsample_nearest(heatmap: np.ndarray, height: int, width: int) -> np.ndarray:
    """Nearest-neighbor upsample of a [h, w] map to [height, width] (the
    eval protocol's 64x64 -> 224x224 resize, run_experiment.py:186-201)."""
    h, w = heatmap.shape
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return heatmap[rows][:, cols]


def overlay_heatmap_on_image(
    heatmap: np.ndarray,
    image,
    alpha: float = 0.6,
    cmap: str = "plasma",
):
    """Blend a [h, w] heatmap over an RGB image -> PIL image."""
    import PIL.Image
    from matplotlib import pyplot as plt

    img = _to_numpy_image(image)
    hm = upsample_nearest(np.asarray(heatmap, np.float64), img.shape[0], img.shape[1])
    lo, hi = hm.min(), hm.max()
    hm = (hm - lo) / (hi - lo if hi > lo else 1.0)
    colored = (plt.get_cmap(cmap)(hm)[:, :, :3] * 255).astype(np.float64)
    blended = (alpha * colored + (1 - alpha) * img[..., :3]).astype(np.uint8)
    return PIL.Image.fromarray(blended)


def plot_concept_heatmaps(
    image,
    heatmaps: np.ndarray,
    concepts: Sequence[str],
    save_path: Optional[str] = None,
    cmap: str = "plasma",
):
    """Side-by-side figure: original image + one panel per concept."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    n = len(concepts)
    fig, axes = plt.subplots(1, n + 1, figsize=(3 * (n + 1), 3))
    axes[0].imshow(_to_numpy_image(image))
    axes[0].set_title("image")
    lo, hi = float(np.min(heatmaps)), float(np.max(heatmaps))
    for i, concept in enumerate(concepts):
        axes[i + 1].imshow(heatmaps[i], cmap=cmap, vmin=lo, vmax=hi)
        axes[i + 1].set_title(concept)
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def plot_coefficients_heatmap(
    coefficients: np.ndarray, save_path: Optional[str] = None, cmap: str = "viridis"
):
    """Single coefficient map figure (reference plotting.py:126-178)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(figsize=(4, 4))
    im = ax.imshow(np.asarray(coefficients), cmap=cmap)
    fig.colorbar(im, ax=ax)
    ax.axis("off")
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig
