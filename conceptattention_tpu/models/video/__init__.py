from conceptattention_tpu.models.video.dit import (
    CogVideoXConfig,
    VideoDiTConfig,
    cogvideox_5b_config,
    init_video_dit_params,
    make_video_ids,
    video_dit_forward,
)

__all__ = [
    "CogVideoXConfig",
    "VideoDiTConfig",
    "cogvideox_5b_config",
    "init_video_dit_params",
    "make_video_ids",
    "video_dit_forward",
]
