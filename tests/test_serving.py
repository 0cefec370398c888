"""Serving subsystem tests: micro-batcher semantics, per-request seeds on the
batched pipeline path, and the HTTP daemon end-to-end on the tiny config.

The load-bearing property: a request's output is bit-independent of which
batch it rode in (generate_images(seeds=...) draws each prompt's latents from
its own PRNGKey, exactly as generate_image would), so the server's coalescing
and bucket padding are invisible to clients.
"""

import base64
import http.client
import io
import json
import threading
import time

import numpy as np
import pytest
import jax.numpy as jnp

import conceptattention_tpu as cat
from conceptattention_tpu.serving import (
    ConceptAttentionServer,
    EncodeRequest,
    GenerateRequest,
    MicroBatcher,
    RequestError,
    next_bucket,
)

SIZE = 64  # flux-tiny: VAE factor 2 -> 32x32 latents -> 16x16 tokens
CONCEPTS = ["cat", "sky"]


# ---------------------------------------------------------------------------
class TestMicroBatcher:
    def test_coalesces_concurrent_requests(self):
        release = threading.Event()
        calls = []

        def batch_fn(reqs):
            calls.append(list(reqs))
            if len(calls) == 1:
                release.wait(5)  # hold the worker so the queue fills
            return [r * 10 for r in reqs]

        b = MicroBatcher(batch_fn, max_batch=8, max_wait_ms=50)
        futs = [b.submit(1)]
        while not calls:  # first request is in flight on the worker
            time.sleep(0.005)
        futs += [b.submit(i) for i in (2, 3, 4)]
        release.set()
        assert [f.result(5) for f in futs] == [10, 20, 30, 40]
        b.close()
        assert len(calls) == 2  # 1 solo + 1 coalesced batch of 3
        assert calls[1] == [2, 3, 4]
        assert b.stats.requests_total == 4
        assert b.stats.batches_total == 2
        assert b.stats.snapshot()["mean_batch_size"] == 2.0

    def test_respects_max_batch(self):
        release = threading.Event()
        calls = []

        def batch_fn(reqs):
            calls.append(list(reqs))
            if len(calls) == 1:
                release.wait(5)
            return list(reqs)

        b = MicroBatcher(batch_fn, max_batch=2, max_wait_ms=200)
        futs = [b.submit(0)]
        while not calls:
            time.sleep(0.005)
        futs += [b.submit(i) for i in (1, 2, 3, 4)]
        release.set()
        assert [f.result(5) for f in futs] == [0, 1, 2, 3, 4]
        b.close()
        assert max(len(c) for c in calls) <= 2

    def test_groups_by_key(self):
        release = threading.Event()
        calls = []

        def batch_fn(reqs):
            calls.append(list(reqs))
            if len(calls) == 1:
                release.wait(5)
            return list(reqs)

        b = MicroBatcher(batch_fn, max_batch=8, max_wait_ms=30,
                         group_key=lambda r: r % 2)
        futs = [b.submit(0)]
        while not calls:
            time.sleep(0.005)
        futs += [b.submit(i) for i in (2, 3, 4, 5)]  # evens batch, odds batch
        release.set()
        assert [f.result(5) for f in futs] == [0, 2, 3, 4, 5]
        b.close()
        batches = [sorted(c) for c in calls[1:]]
        assert [2, 4] in batches and [3, 5] in batches

    def test_error_propagates_to_every_future(self):
        def batch_fn(reqs):
            raise RuntimeError("device on fire")

        b = MicroBatcher(batch_fn, max_batch=4, max_wait_ms=5)
        futs = [b.submit(i) for i in range(3)]
        for f in futs:
            with pytest.raises(RuntimeError, match="device on fire"):
                f.result(5)
        assert b.stats.errors_total == 3
        b.close()

    def test_close_rejects_new_and_drains(self):
        b = MicroBatcher(lambda reqs: list(reqs), max_batch=4, max_wait_ms=1)
        assert b.submit(7).result(5) == 7
        b.close()
        with pytest.raises(RuntimeError):
            b.submit(8)

    def test_result_count_mismatch_is_an_error(self):
        b = MicroBatcher(lambda reqs: [1, 2, 3], max_batch=1, max_wait_ms=1)
        with pytest.raises(RuntimeError, match="results"):
            b.submit("x").result(5)
        b.close()

    def test_next_bucket(self):
        assert next_bucket(1, (1, 2, 4, 8)) == 1
        assert next_bucket(3, (1, 2, 4, 8)) == 4
        assert next_bucket(8, (1, 2, 4, 8)) == 8
        assert next_bucket(9, (1, 2, 4, 8)) == 9  # beyond the largest bucket


# ---------------------------------------------------------------------------
class TestGenerateRequestValidation:
    def test_minimal_ok(self):
        r = GenerateRequest.from_json({"prompt": "a cat", "concepts": ["cat"]})
        assert r.width == 1024 and r.attention_norm == "sparsemax"

    @pytest.mark.parametrize("body,msg", [
        ({}, "prompt"),
        ({"prompt": "x"}, "concepts"),
        ({"prompt": "x", "concepts": []}, "concepts"),
        ({"prompt": "x", "concepts": ["c"], "width": 100}, "multiples of 16"),
        ({"prompt": "x", "concepts": ["c"], "num_inference_steps": 0}, "num_inference_steps"),
        ({"prompt": "x", "concepts": ["c"], "attention_norm": "magic"}, "attention_norm"),
        ({"prompt": "x", "concepts": ["c"], "heatmap_format": "bmp"}, "heatmap_format"),
        ({"prompt": "x", "concepts": ["c"], "softmax": 1}, "boolean"),
        ({"prompt": "x", "concepts": ["c"], "bogus": 1}, "unknown"),
        ({"prompt": "x", "concepts": ["c"], "layer_indices": [-1]}, "layer_indices"),
    ])
    def test_rejects(self, body, msg):
        with pytest.raises(RequestError, match=msg):
            GenerateRequest.from_json(body)

    def test_batch_key_ignores_prompt_seed_and_formatting(self):
        a = GenerateRequest.from_json(
            {"prompt": "a", "concepts": ["c"], "seed": 1, "cmap": "viridis"})
        b = GenerateRequest.from_json(
            {"prompt": "b", "concepts": ["c"], "seed": 2, "heatmap_format": "array"})
        c = GenerateRequest.from_json(
            {"prompt": "a", "concepts": ["c", "d"], "seed": 1})
        assert a.batch_key() == b.batch_key()
        assert a.batch_key() != c.batch_key()


# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def pipe():
    return cat.ConceptAttentionFluxPipeline("flux-tiny", dtype=jnp.float32)


class TestPerRequestSeeds:
    def test_batched_seeds_match_single_generation(self, pipe):
        """generate_images(seeds=[s1, s2]) row i == generate_image(seed=si)."""
        prompts = ["a cat", "a dog"]
        seeds = [11, 12]
        kwargs = dict(width=SIZE, height=SIZE, num_inference_steps=1,
                      return_image_array=True, return_pil_heatmaps=False,
                      watermark=False)
        batched = pipe.generate_images(prompts, CONCEPTS, seeds=seeds, **kwargs)
        for prompt, seed, out in zip(prompts, seeds, batched):
            solo = pipe.generate_image(prompt, CONCEPTS, seed=seed, **kwargs)
            np.testing.assert_allclose(
                np.asarray(out.image, np.float32),
                np.asarray(solo.image, np.float32),
                atol=1.0,  # one uint8 level of batched-matmul slack
            )
            np.testing.assert_allclose(
                out.concept_heatmaps, solo.concept_heatmaps, atol=1e-4
            )

    def test_seeds_length_mismatch(self, pipe):
        with pytest.raises(ValueError, match="seeds"):
            pipe.generate_images(["a"], CONCEPTS, seeds=[1, 2], width=SIZE,
                                 height=SIZE, num_inference_steps=1)


# ---------------------------------------------------------------------------
def _post(port, body, path="/v1/generate", timeout=300):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", path, json.dumps(body),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    return resp.status, data


def _get(port, path, timeout=30):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("GET", path)
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    return resp.status, data


def _png_to_array(b64: str) -> np.ndarray:
    import PIL.Image

    return np.asarray(PIL.Image.open(io.BytesIO(base64.b64decode(b64))))


@pytest.fixture(scope="module")
def server(pipe):
    srv = ConceptAttentionServer(
        pipe, port=0, max_batch=2, max_wait_ms=150, bucket_sizes=(2,),
        request_timeout_s=300,
    )
    with srv:
        yield srv


BASE_BODY = {
    "prompt": "a cat in the sky",
    "concepts": CONCEPTS,
    "width": SIZE,
    "height": SIZE,
    "num_inference_steps": 1,
    "seed": 3,
}


class TestServerEndToEnd:
    def test_single_request_roundtrip(self, server, pipe):
        status, data = _post(server.port, BASE_BODY)
        assert status == 200, data
        img = _png_to_array(data["image"])
        assert img.shape == (SIZE, SIZE, 3)
        assert set(data["concept_heatmaps"]) == set(CONCEPTS)
        hm = _png_to_array(data["concept_heatmaps"]["cat"])
        assert hm.shape[:2] == (SIZE // 4, SIZE // 4)  # token grid 16x16
        assert data["latency_ms"] > 0

        # Batching transparency: the padded batch-of-2 HTTP result matches a
        # direct unbatched generate_image with the same arguments.
        solo = pipe.generate_image(
            BASE_BODY["prompt"], CONCEPTS, width=SIZE, height=SIZE,
            num_inference_steps=1, seed=3, return_image_array=True,
        )
        diff = np.abs(img.astype(np.float32)
                      - np.asarray(solo.image, np.float32))
        assert diff.max() <= 2.0 and diff.mean() < 0.5

    def test_concurrent_requests_coalesce(self, server):
        results = {}

        def call(i):
            body = dict(BASE_BODY, prompt=f"a photo number {i}", seed=100 + i)
            results[i] = _post(server.port, body)

        before = server.batcher.stats.batches_total
        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(status == 200 for status, _ in results.values())
        batches = server.batcher.stats.batches_total - before
        assert batches < 4  # coalescing happened (4 requests, max_batch=2)
        # Distinct seeds/prompts produced distinct images.
        imgs = [_png_to_array(d["image"]) for _, d in results.values()]
        assert any(not np.array_equal(imgs[0], im) for im in imgs[1:])

    def test_heatmap_array_format(self, server):
        body = dict(BASE_BODY, heatmap_format="array",
                    return_cross_attention=True)
        status, data = _post(server.port, body)
        assert status == 200, data
        arr = np.asarray(data["concept_heatmaps"]["sky"], np.float32)
        assert arr.shape == (SIZE // 4, SIZE // 4)
        assert set(data["cross_attention_maps"]) == set(CONCEPTS)

    def test_bad_request_is_400(self, server):
        status, data = _post(server.port, {"prompt": "x"})
        assert status == 400 and "concepts" in data["error"]
        status, _ = _post(server.port, BASE_BODY, path="/v1/nope")
        assert status == 404

    def test_unknown_cmap_is_400_not_batch_poison(self, server):
        status, data = _post(server.port, dict(BASE_BODY, cmap="notacmap"))
        assert status == 400 and "cmap" in data["error"]
        # array format doesn't use the colormap — any string is accepted
        status, _ = _post(server.port, dict(BASE_BODY, cmap="notacmap",
                                            heatmap_format="array"))
        assert status == 200

    def test_layer_indices_beyond_model_depth_is_400(self, server):
        status, data = _post(server.port, dict(BASE_BODY, layer_indices=[999]))
        assert status == 400 and "depth" in data["error"]

    def test_invalid_content_length_is_400(self, server):
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
        conn.putrequest("POST", "/v1/generate")
        conn.putheader("Content-Length", "abc")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert resp.will_close  # connection can't be resynchronized
        conn.close()

    def test_max_batch_must_fit_buckets(self, pipe):
        with pytest.raises(ValueError, match="bucket"):
            ConceptAttentionServer(pipe, port=0, max_batch=16,
                                   bucket_sizes=(1, 2, 4, 8))

    def test_warmup_compiles_buckets(self, server):
        proto = GenerateRequest.from_json(dict(BASE_BODY))
        before = server.metrics.requests_total
        server.warmup(proto)  # one _run_batch per bucket; bypasses HTTP
        assert server.metrics.requests_total == before  # not counted as traffic
        # traffic after warmup still works
        status, _ = _post(server.port, BASE_BODY)
        assert status == 200

    def test_encode_roundtrip_matches_direct_call(self, server, pipe):
        import PIL.Image

        rng = np.random.RandomState(0)
        arr = (rng.rand(SIZE, SIZE, 3) * 255).astype(np.uint8)
        buf = io.BytesIO()
        PIL.Image.fromarray(arr).save(buf, format="PNG")
        body = {
            "image": base64.b64encode(buf.getvalue()).decode(),
            "concepts": CONCEPTS,
            "width": SIZE,
            "height": SIZE,
            "num_steps": 2,
            "noise_timestep": 1,
            "seed": 4,
            "heatmap_format": "array",
        }
        status, data = _post(server.port, body, path="/v1/encode")
        assert status == 200, data
        served = np.asarray(data["concept_heatmaps"]["cat"], np.float32)
        assert served.shape == (SIZE // 4, SIZE // 4)
        assert "image" not in data  # encode returns heatmaps, not the input

        direct = pipe.encode_image(
            PIL.Image.fromarray(arr), list(CONCEPTS), width=SIZE, height=SIZE,
            num_steps=2, noise_timestep=1, seed=4, return_pil_heatmaps=False,
        )
        np.testing.assert_allclose(served, direct.concept_heatmaps[0], atol=1e-4)

    def test_encode_requests_coalesce_across_concepts(self, server, pipe):
        """Concurrent /v1/encode requests with DIFFERENT concept words (same
        count), seeds, and images share a batch key and coalesce into one
        encode_images dispatch — and each result still matches its own
        direct encode_image call."""
        import PIL.Image

        rng = np.random.RandomState(7)
        bodies, arrays, conc = {}, {}, {}
        for i in range(4):
            arr = (rng.rand(SIZE, SIZE, 3) * 255).astype(np.uint8)
            buf = io.BytesIO()
            PIL.Image.fromarray(arr).save(buf, format="PNG")
            concepts = [["cat", "sky"], ["dog", "sea"],
                        ["tree", "rock"], ["sun", "grass"]][i]
            arrays[i], conc[i] = arr, concepts
            bodies[i] = {
                "image": base64.b64encode(buf.getvalue()).decode(),
                "concepts": concepts, "width": SIZE, "height": SIZE,
                "num_steps": 2, "noise_timestep": 1, "seed": 50 + i,
                "heatmap_format": "array",
            }
        # Same batch key despite different words/seeds/images.
        keys = {EncodeRequest.from_json(b).batch_key() for b in bodies.values()}
        assert len(keys) == 1

        results = {}

        def call(i):
            results[i] = _post(server.port, bodies[i], path="/v1/encode")

        before = server.batcher.stats.batches_total
        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(status == 200 for status, _ in results.values())
        assert server.batcher.stats.batches_total - before < 4  # coalesced

        for i in range(4):
            direct = pipe.encode_image(
                PIL.Image.fromarray(arrays[i]), conc[i], width=SIZE,
                height=SIZE, num_steps=2, noise_timestep=1, seed=50 + i,
                return_pil_heatmaps=False,
            )
            served = np.asarray(
                results[i][1]["concept_heatmaps"][conc[i][0]], np.float32
            )
            np.testing.assert_allclose(
                served, direct.concept_heatmaps[0], atol=1e-4,
                err_msg=f"request {i} diverges from its direct encode",
            )

    def test_encode_bad_inputs_are_400(self, server):
        status, data = _post(server.port, {"image": "!!notb64!!",
                                           "concepts": CONCEPTS},
                             path="/v1/encode")
        assert status == 400 and "decodable" in data["error"]
        ok_img = base64.b64encode(b"x").decode()  # valid b64, invalid image
        status, data = _post(server.port, {"image": ok_img, "concepts": CONCEPTS},
                             path="/v1/encode")
        assert status == 400 and "decodable" in data["error"]
        status, data = _post(server.port, dict(
            image=ok_img, concepts=CONCEPTS, num_steps=2, noise_timestep=5),
            path="/v1/encode")
        assert status == 400 and "noise_timestep" in data["error"]

    def test_health_and_metrics(self, server):
        status, health = _get(server.port, "/healthz")
        assert status == 200
        assert health["status"] == "ok"
        assert health["model"] == "flux-tiny"
        status, metrics = _get(server.port, "/metrics")
        assert status == 200
        assert metrics["requests_total"] >= 1
        assert metrics["batcher"]["batches_total"] >= 1
        assert "latency_ms" in metrics


# ---------------------------------------------------------------------------
class TestAdmissionControl:
    """Bounded queue: overload fails fast with QueueFullError / HTTP 503 +
    Retry-After instead of waiting toward the request timeout."""

    def test_batcher_rejects_when_queue_full(self):
        from conceptattention_tpu.serving import QueueFullError

        release = threading.Event()
        started = threading.Event()

        def batch_fn(reqs):
            started.set()
            release.wait(30)
            return list(reqs)

        b = MicroBatcher(batch_fn, max_batch=1, max_wait_ms=1,
                         max_queue_depth=2)
        try:
            f0 = b.submit(0)
            assert started.wait(10)  # worker is now blocked inside batch_fn
            f1, f2 = b.submit(1), b.submit(2)  # fill the queue (depth 2)
            with pytest.raises(QueueFullError):
                b.submit(3)
            assert b.stats.rejects_total == 1
            release.set()
            assert [f.result(30) for f in (f0, f1, f2)] == [0, 1, 2]
            # Drained queue admits again.
            assert b.submit(4).result(30) == 4
        finally:
            release.set()
            b.close(timeout=5)

    def test_http_503_with_retry_after_under_burst(self):
        import PIL.Image

        class _Out:
            image = PIL.Image.new("RGB", (8, 8))
            concept_heatmaps = np.zeros((len(CONCEPTS), 4, 4), np.float32)
            cross_attention_maps = np.zeros((len(CONCEPTS), 4, 4), np.float32)

        class _SlowPipe:
            """Minimal pipeline stand-in: one Event-gated generate so the
            test controls exactly when the worker is busy."""

            model_name = "fake"
            active_loras: list = []

            class cfg:
                depth = 2

            def __init__(self):
                self.release = threading.Event()
                self.started = threading.Event()

            def generate_images(self, prompts, concepts, **_kw):
                self.started.set()
                self.release.wait(30)
                return [_Out() for _ in prompts]

        pipe = _SlowPipe()
        srv = ConceptAttentionServer(
            pipe, port=0, max_batch=1, max_wait_ms=1, bucket_sizes=(1,),
            request_timeout_s=60, max_queue_depth=1,
        )
        statuses = {}

        def call(i):
            body = dict(BASE_BODY, width=16, height=16, seed=i)
            conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
            conn.request("POST", "/v1/generate", json.dumps(body),
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            statuses[i] = (resp.status, resp.getheader("Retry-After"),
                           json.loads(resp.read()))
            conn.close()

        with srv:
            t0 = threading.Thread(target=call, args=(0,))
            t0.start()
            assert pipe.started.wait(10)  # worker busy; queue empty
            t1 = threading.Thread(target=call, args=(1,))
            t1.start()
            deadline = time.monotonic() + 10
            while (srv.batcher.queue_depth() < 1
                   and time.monotonic() < deadline):
                time.sleep(0.005)
            assert srv.batcher.queue_depth() == 1  # request 1 queued
            call(2)  # queue full -> rejected immediately
            status, retry_after, data = statuses[2]
            assert status == 503 and "full" in data["error"]
            assert retry_after is not None and int(retry_after) >= 1
            pipe.release.set()
            t0.join(30)
            t1.join(30)
            assert statuses[0][0] == 200 and statuses[1][0] == 200
            _, metrics = _get(srv.port, "/metrics")
            assert metrics["batcher"]["rejects_total"] == 1
            assert metrics["max_queue_depth"] == 1


# ---------------------------------------------------------------------------
class TestLoraSwap:
    """POST /v1/loras replaces the active adapter set at runtime; swaps ride
    the batcher worker so they serialize with generation batches."""

    @pytest.fixture(scope="class")
    def adapter_path(self, tmp_path_factory, pipe):
        import jax
        from safetensors.numpy import save_file
        from conceptattention_tpu.training.lora import (
            export_lora_state_dict,
            init_lora_params,
        )

        lora = init_lora_params(jax.random.PRNGKey(21), pipe.params, rank=4)
        lora = jax.tree.map(lambda x: x + 0.05 if x.ndim == 3 else x, lora)
        sd = {k: np.asarray(v, np.float32)
              for k, v in export_lora_state_dict(lora).items()}
        path = tmp_path_factory.mktemp("loras") / "style.safetensors"
        save_file(sd, str(path))
        return str(path)

    @pytest.fixture(scope="class")
    def swap_server(self):
        swap_pipe = cat.ConceptAttentionFluxPipeline(
            "flux-tiny", dtype=jnp.float32, keep_base_for_swap=True
        )
        srv = ConceptAttentionServer(
            swap_pipe, port=0, max_batch=2, max_wait_ms=50, bucket_sizes=(2,),
            request_timeout_s=300,
        )
        with srv:
            yield srv

    def test_swap_changes_output_and_clear_restores(self, swap_server,
                                                    adapter_path):
        port = swap_server.port
        status, data = _get(port, "/v1/loras")
        assert status == 200 and data["active_loras"] == []

        status, base = _post(port, dict(BASE_BODY, heatmap_format="array"))
        assert status == 200, base
        base_maps = np.asarray(base["concept_heatmaps"]["cat"], np.float32)

        status, data = _post(
            port, {"adapters": [{"path": adapter_path, "strength": 0.7}]},
            path="/v1/loras")
        assert status == 200, data
        assert data["active_loras"] == [
            {"source": adapter_path, "strength": 0.7}
        ]
        status, data = _get(port, "/v1/loras")
        assert data["active_loras"][0]["source"] == adapter_path

        status, adapted = _post(port, dict(BASE_BODY, heatmap_format="array"))
        assert status == 200, adapted
        adapted_maps = np.asarray(adapted["concept_heatmaps"]["cat"], np.float32)
        assert np.abs(adapted_maps - base_maps).max() > 0

        # swap == merging the same adapter at construction time
        direct = cat.ConceptAttentionFluxPipeline(
            "flux-tiny", dtype=jnp.float32, lora=adapter_path,
            lora_strength=0.7,
        ).generate_image(
            BASE_BODY["prompt"], CONCEPTS, width=SIZE, height=SIZE,
            num_inference_steps=1, seed=BASE_BODY["seed"],
            return_pil_heatmaps=False,
        )
        np.testing.assert_allclose(
            adapted_maps, np.asarray(direct.concept_heatmaps[0], np.float32),
            atol=2e-3,  # batched-vs-solo matmul slack (bucket pads to 2)
        )

        status, data = _post(port, {"adapters": []}, path="/v1/loras")
        assert status == 200 and data["active_loras"] == []
        status, restored = _post(port, dict(BASE_BODY, heatmap_format="array"))
        restored_maps = np.asarray(restored["concept_heatmaps"]["cat"], np.float32)
        np.testing.assert_array_equal(restored_maps, base_maps)

    def test_swap_validation(self, swap_server, server, adapter_path):
        # server without keep_base_for_swap refuses swaps with a 400
        status, data = _post(server.port, {"adapters": []}, path="/v1/loras")
        assert status == 400 and "lora_swap" in data["error"]
        # nonexistent adapter path is a 400 on the swap-capable server
        status, data = _post(
            swap_server.port,
            {"adapters": [{"path": "/nonexistent.safetensors"}]},
            path="/v1/loras")
        assert status == 400 and "not found" in data["error"]
        # malformed strength
        status, data = _post(
            swap_server.port,
            {"adapters": [{"path": adapter_path, "strength": "x"}]},
            path="/v1/loras")
        assert status == 400 and "strength" in data["error"]


# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def video_server(pipe):
    """Server with BOTH the tiny flux pipeline and a tiny video pipeline:
    /v1/generate_video rides the same batcher as image traffic."""
    from conceptattention_tpu.models.video.dit import CogVideoXConfig
    from conceptattention_tpu.pipeline.video_pipeline import (
        VideoConceptAttentionPipeline,
    )

    vpipe = VideoConceptAttentionPipeline(
        cfg=CogVideoXConfig(
            num_attention_heads=4, attention_head_dim=16, time_embed_dim=32,
            text_embed_dim=64, num_layers=2, max_text_seq_length=16,
            use_rotary_positional_embeddings=True,
        ),
        dtype=jnp.float32,
    )
    srv = ConceptAttentionServer(
        pipe, port=0, max_batch=2, max_wait_ms=25, bucket_sizes=(2,),
        request_timeout_s=300, video_pipeline=vpipe,
    )
    with srv:
        yield srv, vpipe


VIDEO_BODY = {
    "prompt": "a river through a forest",
    "concepts": ["river", "forest"],
    "num_frames": 2,
    "height": 8,
    "width": 8,
    "num_inference_steps": 2,
    "seed": 5,
}


class TestVideoServing:
    def test_video_roundtrip_matches_direct_call(self, video_server):
        """POST /v1/generate_video == VideoConceptAttentionPipeline
        .generate_video with the same args (the served path adds nothing
        but transport)."""
        server, vpipe = video_server
        body = dict(VIDEO_BODY, heatmap_format="array")
        status, data = _post(server.port, body, path="/v1/generate_video")
        assert status == 200, data
        assert data["num_frames"] == 2 and data["batch_size"] == 1
        assert set(data["concept_heatmaps"]) == set(VIDEO_BODY["concepts"])

        direct = vpipe.generate_video(
            VIDEO_BODY["prompt"], VIDEO_BODY["concepts"],
            num_frames=2, height=8, width=8, num_inference_steps=2, seed=5,
        )
        served = np.asarray(data["concept_heatmaps"]["river"], np.float32)
        assert served.shape == tuple(direct.concept_heatmaps.shape[1:])
        np.testing.assert_allclose(
            served, np.asarray(direct.concept_heatmaps[0], np.float32),
            atol=1e-5,
        )

    def test_video_png_format(self, video_server):
        server, _ = video_server
        status, data = _post(server.port, VIDEO_BODY,
                             path="/v1/generate_video")
        assert status == 200, data
        frames = data["concept_heatmaps"]["river"]
        assert len(frames) == VIDEO_BODY["num_frames"]
        arr = _png_to_array(frames[0])
        assert arr.shape[:2] == (8 // 2, 8 // 2)  # latent 8 / patch 2

    def test_video_validation(self, video_server, server):
        vsrv, _ = video_server
        # odd latent size vs patch_size=2
        status, data = _post(vsrv.port, dict(VIDEO_BODY, height=7),
                             path="/v1/generate_video")
        assert status == 400 and "patch_size" in data["error"]
        # layer index beyond the tiny model's 2 layers
        status, data = _post(vsrv.port, dict(VIDEO_BODY, layer_indices=[5]),
                             path="/v1/generate_video")
        assert status == 400 and "layer_indices" in data["error"]
        # bad scheduler
        status, data = _post(vsrv.port, dict(VIDEO_BODY, scheduler="euler"),
                             path="/v1/generate_video")
        assert status == 400 and "scheduler" in data["error"]
        # a server started WITHOUT a video pipeline refuses with a 400
        status, data = _post(server.port, VIDEO_BODY,
                             path="/v1/generate_video")
        assert status == 400 and "video pipeline" in data["error"]
