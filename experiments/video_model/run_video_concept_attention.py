"""Video concept-attention driver.

Parity target: `experiments/video_model/cogvideox/test_load_cogvideo.py:15-65`
in the reference (manuragkhullar/ConceptAttention): generate a video with
concept tokens and write per-frame concept heatmap animations.

With CogVideoX-5b checkpoints unavailable in this environment, the driver runs
the TPU-native video DiT (models/video/dit.py) at the configured scale;
`--tiny` exercises the full path quickly.
"""

import os as _os
import sys as _sys

# Allow running as a plain script from anywhere: put the repo root (two
# levels up) on sys.path so `conceptattention_tpu` imports without install.
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", ".."))
)


import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--prompt", default="a dog running through a field")
    parser.add_argument("--concepts", nargs="+", default=["dog", "grass", "sky"])
    parser.add_argument("--num_frames", type=int, default=13)
    parser.add_argument("--height", type=int, default=60, help="latent px")
    parser.add_argument("--width", type=int, default=90, help="latent px")
    parser.add_argument("--num_steps", type=int, default=50)
    parser.add_argument("--guidance_scale", type=float, default=6.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output_dir", default="video_heatmaps")
    parser.add_argument("--tiny", action="store_true", help="tiny config smoke run")
    parser.add_argument(
        "--decode", action="store_true",
        help="decode latents to pixel frames through the 3D VAE and write "
             "video.gif next to the heatmaps",
    )
    args = parser.parse_args()

    import jax.numpy as jnp

    from conceptattention_tpu.models.video.dit import CogVideoXConfig, cogvideox_5b_config
    from conceptattention_tpu.pipeline.video_pipeline import VideoConceptAttentionPipeline
    from conceptattention_tpu.utils.video_utils import make_concept_attention_video

    if args.tiny:
        cfg = CogVideoXConfig(
            num_attention_heads=4, attention_head_dim=16, time_embed_dim=32,
            text_embed_dim=64, num_layers=2, max_text_seq_length=16,
            use_rotary_positional_embeddings=True,
        )
        args.num_frames, args.height, args.width = 4, 8, 8
        args.num_steps = min(args.num_steps, 5)
    else:
        cfg = cogvideox_5b_config()

    vae_cfg = None
    if args.tiny:
        from conceptattention_tpu.models.video.vae import CogVideoXVAEConfig

        vae_cfg = CogVideoXVAEConfig(
            block_out_channels=(8, 16), latent_channels=cfg.in_channels,
            layers_per_block=1, norm_num_groups=4,
        )
    pipe = VideoConceptAttentionPipeline(cfg=cfg, dtype=jnp.bfloat16, vae_cfg=vae_cfg)
    out = pipe.generate_video(
        prompt=args.prompt,
        concepts=args.concepts,
        num_frames=args.num_frames,
        height=args.height,
        width=args.width,
        num_inference_steps=args.num_steps,
        guidance_scale=args.guidance_scale,
        seed=args.seed,
        decode=args.decode,
    )
    import os

    os.makedirs(args.output_dir, exist_ok=True)
    path = os.path.join(args.output_dir, "concepts.gif")
    make_concept_attention_video(out.concept_heatmaps, args.concepts, path)
    print(f"wrote {path}; heatmaps {out.concept_heatmaps.shape}")
    if args.decode:
        from conceptattention_tpu.utils.video_utils import write_video

        vpath = os.path.join(args.output_dir, "video.gif")
        write_video(out.video_frames, vpath)
        print(f"wrote {vpath}; frames {out.video_frames.shape}")


if __name__ == "__main__":
    main()
