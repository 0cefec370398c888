"""`python -m conceptattention_tpu.serving` — run the generation daemon.

Loads the pipeline once (checkpoints from the usual env-var paths, see
weights/convert.py), then serves until interrupted. Flag names mirror
cli.py's generation flags where they overlap.
"""

import argparse
import json
import logging
import signal
import threading


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        prog="conceptattention_tpu.serving",
        description="Micro-batched HTTP serving daemon for concept-attention generation",
    )
    p.add_argument("--model_name", "--model", dest="model_name", default="flux-schnell",
                   help="config registry key")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000, help="0 picks a free port")
    p.add_argument("--quantize", default=None, choices=["w8", "w8a8", "w4"],
                   help="quantized layer stacks (w8a8 is the single-chip "
                        "serving path; w4 = group-wise int4, ~6 GB full flux)")
    p.add_argument("--attention_backend", default=None,
                   help="xla / pallas / ring / pallas_interpret (default: per device)")
    p.add_argument("--int8_qk", action="store_true",
                   help="int8 x int8 attention scores on the MXU (Pallas backends)")
    p.add_argument("--lora", nargs="+", default=None, metavar="PATH",
                   help="LoRA adapter safetensors path(s), merged at load")
    p.add_argument("--lora_strength", type=float, nargs="+", default=None)
    p.add_argument("--lora_swap", action="store_true",
                   help="enable POST /v1/loras runtime adapter swapping "
                        "(keeps a pristine host-side copy of the pre-merge "
                        "weights — costs host RAM)")
    p.add_argument("--max_batch", type=int, default=8,
                   help="largest coalesced batch (= largest compiled graph)")
    p.add_argument("--max_wait_ms", type=float, default=25.0,
                   help="how long a batch waits for stragglers")
    p.add_argument("--bucket_sizes", type=int, nargs="+", default=[1, 2, 4, 8],
                   help="padded batch sizes (one compiled graph each)")
    p.add_argument("--request_timeout_s", type=float, default=600.0)
    p.add_argument("--max_queue_depth", type=int, default=64,
                   help="admission control: queued requests beyond this get "
                        "HTTP 503 + Retry-After instead of waiting toward "
                        "the request timeout (0 = unbounded)")
    p.add_argument("--video", dest="video_model", default=None, metavar="NAME",
                   const="cogvideox-5b", nargs="?",
                   help="also serve POST /v1/generate_video from a CogVideoX-"
                        "style video pipeline (config registry key; bare "
                        "--video = cogvideox-5b). Shares the device "
                        "dispatcher with image traffic")
    p.add_argument("--warmup", default=None, metavar="JSON",
                   help='pre-compile every bucket before listening, e.g. '
                        '\'{"prompt": "w", "concepts": ["object"], "width": 1024, '
                        '"height": 1024, "num_inference_steps": 4}\' — the '
                        "concept COUNT/resolution/steps must match expected "
                        "traffic (they shape the compiled graph)")
    p.add_argument("--log_level", default="INFO")
    args = p.parse_args(argv)

    logging.basicConfig(
        level=getattr(logging, args.log_level.upper(), logging.INFO),
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )

    from conceptattention_tpu.pipeline.concept_pipeline import ConceptAttentionFluxPipeline
    from conceptattention_tpu.serving import ConceptAttentionServer

    pipe_kwargs = {}
    if args.lora:
        pipe_kwargs["lora"] = args.lora
        if args.lora_strength:
            pipe_kwargs["lora_strength"] = args.lora_strength
    pipeline = ConceptAttentionFluxPipeline(
        args.model_name,
        quantize=args.quantize or False,
        attention_backend=args.attention_backend,
        int8_qk=args.int8_qk,
        keep_base_for_swap=args.lora_swap,
        **pipe_kwargs,
    )
    video_pipeline = None
    if args.video_model:
        from conceptattention_tpu.models.video.dit import (
            CogVideoXConfig,
            cogvideox_5b_config,
        )
        from conceptattention_tpu.pipeline.video_pipeline import (
            VideoConceptAttentionPipeline,
        )

        if args.video_model == "cogvideox-5b":
            vcfg = cogvideox_5b_config()
        elif args.video_model == "cogvideox-2b":
            vcfg = CogVideoXConfig()
        elif args.video_model == "cogvideox-tiny":
            vcfg = CogVideoXConfig(
                num_attention_heads=4, attention_head_dim=16,
                time_embed_dim=32, text_embed_dim=64, num_layers=2,
                max_text_seq_length=16,
                use_rotary_positional_embeddings=True,
            )
        else:
            p.error(f"unknown --video model {args.video_model!r} (expected "
                    "cogvideox-5b / cogvideox-2b / cogvideox-tiny)")
        video_pipeline = VideoConceptAttentionPipeline(
            cfg=vcfg, quantize=args.quantize or False
        )

    server = ConceptAttentionServer(
        pipeline,
        video_pipeline=video_pipeline,
        host=args.host,
        port=args.port,
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        bucket_sizes=args.bucket_sizes,
        request_timeout_s=args.request_timeout_s,
        max_queue_depth=args.max_queue_depth or None,
    )
    if args.warmup:
        from conceptattention_tpu.serving import GenerateRequest

        proto = GenerateRequest.from_json(json.loads(args.warmup))
        print("warming up compiled graphs (one per bucket)...")
        server.warmup(proto)

    # Graceful drain on SIGTERM (the production stop signal): stop accepting
    # connections, finish in-flight batches, then exit.
    def _term(_signum, _frame):
        threading.Thread(target=server.stop, daemon=True).start()

    signal.signal(signal.SIGTERM, _term)
    print(f"serving {args.model_name} at http://{args.host}:{server.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
