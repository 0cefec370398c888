from conceptattention_tpu.sampling.rectified_flow import denoise, get_noise, prepare_image_tokens

__all__ = ["denoise", "get_noise", "prepare_image_tokens"]
