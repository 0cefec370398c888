"""Video concept-attention driver.

Parity target: `experiments/video_model/cogvideox/test_load_cogvideo.py:15-65`
in the reference (manuragkhullar/ConceptAttention): generate a video with
concept tokens and write per-frame concept heatmap animations.

With CogVideoX-5b checkpoints unavailable in this environment, the driver runs
the TPU-native video DiT (models/video/dit.py) at the configured scale;
`--tiny` exercises the full path quickly.
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--prompt", default="a dog running through a field")
    parser.add_argument("--concepts", nargs="+", default=["dog", "grass", "sky"])
    parser.add_argument("--num_frames", type=int, default=13)
    parser.add_argument("--height_tokens", type=int, default=30)
    parser.add_argument("--width_tokens", type=int, default=45)
    parser.add_argument("--num_steps", type=int, default=50)
    parser.add_argument("--guidance_scale", type=float, default=6.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output_dir", default="video_heatmaps")
    parser.add_argument("--tiny", action="store_true", help="tiny config smoke run")
    args = parser.parse_args()

    import jax.numpy as jnp

    from conceptattention_tpu.models.video.dit import VideoDiTConfig
    from conceptattention_tpu.pipeline.video_pipeline import VideoConceptAttentionPipeline
    from conceptattention_tpu.utils.video_utils import make_concept_attention_video

    if args.tiny:
        cfg = VideoDiTConfig(
            in_channels=16, text_dim=64, hidden_size=128, num_heads=4, depth=2,
            axes_dim=(8, 12, 12),
        )
        args.num_frames, args.height_tokens, args.width_tokens = 4, 8, 8
        args.num_steps = min(args.num_steps, 5)
    else:
        cfg = VideoDiTConfig()

    pipe = VideoConceptAttentionPipeline(cfg=cfg, dtype=jnp.bfloat16)
    out = pipe.generate_video(
        prompt=args.prompt,
        concepts=args.concepts,
        num_frames=args.num_frames,
        height_tokens=args.height_tokens,
        width_tokens=args.width_tokens,
        num_inference_steps=args.num_steps,
        guidance_scale=args.guidance_scale,
        seed=args.seed,
    )
    import os

    os.makedirs(args.output_dir, exist_ok=True)
    path = os.path.join(args.output_dir, "concepts.gif")
    make_concept_attention_video(out.concept_heatmaps, args.concepts, path)
    print(f"wrote {path}; heatmaps {out.concept_heatmaps.shape}")


if __name__ == "__main__":
    main()
