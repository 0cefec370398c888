"""TPU serving subsystem: micro-batched HTTP generation daemon.

`MicroBatcher` coalesces concurrent requests into single batched device
dispatches (the dominant single-chip throughput lever — bench.py's headline
runs batch 8); `ConceptAttentionServer` is the stdlib HTTP front end.

Run a server: ``python -m conceptattention_tpu.serving --model flux-schnell``.
"""

from conceptattention_tpu.serving.batcher import (
    BatcherStats,
    MicroBatcher,
    QueueFullError,
    next_bucket,
)
from conceptattention_tpu.serving.server import (
    ConceptAttentionServer,
    EncodeRequest,
    GenerateRequest,
    RequestError,
    VideoGenerateRequest,
)

__all__ = [
    "BatcherStats",
    "MicroBatcher",
    "QueueFullError",
    "next_bucket",
    "ConceptAttentionServer",
    "EncodeRequest",
    "GenerateRequest",
    "RequestError",
    "VideoGenerateRequest",
]
