"""Concept-attention video visualization.

Parity target: `concept_attention/video/video_utils.py:5-65` in the reference
(manuragkhullar/ConceptAttention): per-concept heatmap videos rendered with
matplotlib FuncAnimation (ffmpeg when available, else GIF via Pillow).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def make_concept_attention_video(
    heatmaps: np.ndarray,
    concepts: Sequence[str],
    save_path: str,
    fps: int = 8,
    cmap: str = "plasma",
) -> None:
    """heatmaps [C, F, h, w] -> one animation with a panel per concept."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import animation
    from matplotlib import pyplot as plt

    heatmaps = np.asarray(heatmaps, dtype=np.float32)
    c, f, _, _ = heatmaps.shape
    lo, hi = heatmaps.min(), heatmaps.max()

    fig, axes = plt.subplots(1, c, figsize=(3 * c, 3))
    if c == 1:
        axes = [axes]
    ims = []
    for i, ax in enumerate(axes):
        ims.append(ax.imshow(heatmaps[i, 0], cmap=cmap, vmin=lo, vmax=hi))
        ax.set_title(concepts[i])
        ax.axis("off")

    def update(frame):
        for i, im in enumerate(ims):
            im.set_data(heatmaps[i, frame])
        return ims

    anim = animation.FuncAnimation(fig, update, frames=f, blit=True)
    writer = _pick_writer(fps)
    anim.save(save_path, writer=writer)
    plt.close(fig)


def make_individual_videos(
    heatmaps: np.ndarray,
    concepts: Sequence[str],
    save_dir: str,
    fps: int = 8,
    cmap: str = "plasma",
) -> List[str]:
    """One animation file per concept; returns written paths."""
    import os

    os.makedirs(save_dir, exist_ok=True)
    paths = []
    for i, concept in enumerate(concepts):
        path = os.path.join(save_dir, f"{concept.replace(' ', '_')}.gif")
        make_concept_attention_video(
            heatmaps[i : i + 1], [concept], path, fps=fps, cmap=cmap
        )
        paths.append(path)
    return paths


def _pick_writer(fps: int):
    from matplotlib import animation

    if animation.writers.is_available("ffmpeg"):
        return animation.FFMpegWriter(fps=fps)
    return animation.PillowWriter(fps=fps)
