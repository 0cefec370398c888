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
    writer, save_path = _pick_writer(fps, save_path)
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


def _pick_writer(fps: int, save_path: str):
    """-> (writer, effective_path). PillowWriter can only encode GIF, so
    without ffmpeg a non-.gif request degrades to .gif (with a notice)
    instead of crashing after rendering every frame."""
    from matplotlib import animation

    if animation.writers.is_available("ffmpeg"):
        return animation.FFMpegWriter(fps=fps), save_path
    if not save_path.lower().endswith(".gif"):
        import os
        import sys

        new_path = os.path.splitext(save_path)[0] + ".gif"
        print(f"ffmpeg unavailable: writing {new_path} instead of "
              f"{save_path}", file=sys.stderr)
        save_path = new_path
    return animation.PillowWriter(fps=fps), save_path


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
    writer, save_path = _pick_writer(fps, save_path)
    anim.save(save_path, writer=writer)
    plt.close(fig)
