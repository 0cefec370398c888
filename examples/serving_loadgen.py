"""Closed-loop load generator for the serving daemon.

Drives `POST /v1/generate` with N concurrent clients against a running
`python -m conceptattention_tpu.serving` instance and reports throughput,
latency quantiles, and how well the micro-batcher coalesced (mean batch size
from /metrics). Use it to pick `--max_batch` / `--max_wait_ms` for a traffic
level: on one chip, images/sec rises with mean batch size (bench.py's
headline is batch 8) while per-request latency rises with wait time.

    python -m conceptattention_tpu.serving --model flux-tiny --port 8311 &
    python examples/serving_loadgen.py --port 8311 --clients 8 --requests 32 \
        --width 64 --height 64 --steps 1

`--mode encode` drives `POST /v1/encode` instead (the zero-shot-segmentation
serving path): per-request images, concept words, and seeds, which still
coalesce into batched `encode_images` dispatches because the encode batch key
pins only the concept COUNT and the shape/protocol fields.
"""

import argparse
import http.client
import json
import statistics
import threading
import time


def call(host, port, body, timeout, max_retries: int = 8,
         path: str = "/v1/generate"):
    """One request, honoring the server's admission-control contract: a 503
    carries Retry-After (queue full) — back off and retry instead of failing.
    Returns (total_s, service_s, retries_503): total includes 503 round-trips
    and backoff sleeps; service is the successful attempt alone (conflating
    the two would bill admission backoff — up to 8 x 30 s — as latency)."""
    retries = 0
    t0 = time.perf_counter()
    while True:
        t_attempt = time.perf_counter()
        conn = http.client.HTTPConnection(host, port, timeout=timeout)
        conn.request("POST", path, json.dumps(body),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        data = resp.read()
        retry_after = resp.getheader("Retry-After")
        conn.close()
        now = time.perf_counter()
        if resp.status == 200:
            return now - t0, now - t_attempt, retries
        if resp.status == 503 and retries < max_retries:
            retries += 1
            time.sleep(min(float(retry_after or 1), 30.0))
            continue
        raise RuntimeError(f"HTTP {resp.status}: {data[:200]!r}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests", type=int, default=32, help="total across clients")
    p.add_argument("--prompt", default="a photo of a dragon standing on a rock")
    p.add_argument("--concepts", nargs="+", default=["dragon", "rock", "sky"])
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--timeout", type=float, default=600.0)
    p.add_argument("--mode", choices=["generate", "encode"], default="generate",
                   help="encode drives /v1/encode (the zero-shot-segmentation "
                   "serving path) with per-request images/concepts/seeds — "
                   "requests coalesce across different concept words since "
                   "only the concept COUNT is in the batch key")
    args = p.parse_args()

    if args.mode == "encode":
        import base64
        import io

        import numpy as np
        import PIL.Image

        rng = np.random.default_rng(0)
        # A few distinct images so coalesced batches carry real per-image
        # variety (one PNG per slot, reused round-robin).
        pngs = []
        for _ in range(4):
            arr = rng.integers(0, 256, (args.height, args.width, 3),
                               dtype=np.uint8)
            buf = io.BytesIO()
            PIL.Image.fromarray(arr).save(buf, format="PNG")
            pngs.append(base64.b64encode(buf.getvalue()).decode())
        # Same concept COUNT (the batch-key requirement), different words.
        alt = (["tree", "water", "cloud", "sun", "grass", "rock"] * 4)
        pools = [args.concepts, alt[:len(args.concepts)]]

        path = "/v1/encode"

        def make_body(i):
            return {
                "image": pngs[i % len(pngs)],
                "concepts": pools[i % len(pools)],
                "width": args.width,
                "height": args.height,
                "num_steps": args.steps,
                "seed": i,
                "heatmap_format": "array",
            }
    else:
        path = "/v1/generate"

        def make_body(i):
            return {
                "prompt": args.prompt,
                "concepts": args.concepts,
                "width": args.width,
                "height": args.height,
                "num_inference_steps": args.steps,
                "seed": i,
            }
    # Warm the compiled graphs outside the timed window: one solo request
    # (smallest bucket) plus a concurrent burst at the test's own concurrency,
    # which coalesces into the same buckets the timed phase will hit. (The
    # server's --warmup flag covers every bucket deterministically; this is
    # the client-side fallback.)
    call(args.host, args.port, make_body(0), args.timeout, path=path)
    warm_threads = [
        threading.Thread(
            target=lambda s=s: call(args.host, args.port, make_body(s),
                                    args.timeout, path=path)
        )
        for s in range(args.clients)
    ]
    for t in warm_threads:
        t.start()
    for t in warm_threads:
        t.join()

    totals, services, errors, rejected_retries = [], [], [], [0]
    lock = threading.Lock()
    counter = iter(range(args.requests))

    def client(cid):
        while True:
            with lock:
                i = next(counter, None)
            if i is None:
                return
            try:
                dt, svc, retries = call(args.host, args.port,
                                        make_body(i), args.timeout, path=path)
                with lock:
                    totals.append(dt)
                    services.append(svc)
                    rejected_retries[0] += retries
            except Exception as e:  # noqa: BLE001 — collected for the report
                with lock:
                    errors.append(f"client{cid}: {e}")

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(c,)) for c in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    conn = http.client.HTTPConnection(args.host, args.port, timeout=30)
    conn.request("GET", "/metrics")
    metrics = json.loads(conn.getresponse().read())
    conn.close()

    def quantiles(xs):
        xs = sorted(xs)
        if not xs:
            return None
        return {
            "p50": round(xs[len(xs) // 2], 3),
            "p90": round(xs[int(0.9 * (len(xs) - 1))], 3),
            "p99": round(xs[int(0.99 * (len(xs) - 1))], 3),
            "max": round(xs[-1], 3),
            "mean": round(statistics.fmean(xs), 3),
        }

    report = {
        "requests_ok": len(totals),
        "errors": len(errors),
        "wall_s": round(wall, 2),
        "images_per_sec": round(len(totals) / wall, 4) if wall else None,
        # service = successful attempt only; total adds 503 retries + backoff
        "service_latency_s": quantiles(services),
        "total_latency_s": quantiles(totals),
        "server_mean_batch_size": metrics.get("batcher", {}).get("mean_batch_size"),
        "server_batches_total": metrics.get("batcher", {}).get("batches_total"),
        "server_batch_size_hist": metrics.get("batcher", {}).get("batch_size_hist"),
        "admission_503_retries": rejected_retries[0],
        "server_rejects_total": metrics.get("batcher", {}).get("rejects_total"),
    }
    print(json.dumps(report, indent=2))
    for e in errors[:5]:
        print("ERROR:", e)


if __name__ == "__main__":
    main()
