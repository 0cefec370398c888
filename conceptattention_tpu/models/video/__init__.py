from conceptattention_tpu.models.video.dit import (
    VideoDiTConfig,
    init_video_dit_params,
    video_dit_forward,
)

__all__ = ["VideoDiTConfig", "init_video_dit_params", "video_dit_forward"]
