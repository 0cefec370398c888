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


def write_video(frames: np.ndarray, save_path: str, fps: int = 8) -> None:
    """uint8 pixel frames [F, H, W, 3] -> GIF (Pillow) or, for other
    extensions, an ffmpeg-written file when available."""
    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = np.clip(frames, 0, 255).astype(np.uint8)
    if save_path.lower().endswith(".gif"):
        from PIL import Image

        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(
            save_path, save_all=True, append_images=imgs[1:],
            duration=int(1000 / fps), loop=0,
        )
        return
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import animation
    from matplotlib import pyplot as plt

    fig = plt.figure(figsize=(frames.shape[2] / 72, frames.shape[1] / 72), dpi=72)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.axis("off")
    im = ax.imshow(frames[0])

    def update(i):
        im.set_data(frames[i])
        return [im]

    anim = animation.FuncAnimation(fig, update, frames=len(frames), blit=True)
    anim.save(save_path, writer=_pick_writer(fps))
    plt.close(fig)
