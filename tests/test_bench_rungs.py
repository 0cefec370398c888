"""bench.py rung plumbing at tiny scale on CPU (the real numbers come from
the driver's on-chip run; these tests pin the code paths: config ladders,
quantized init staging, loop_rate wiring, analytic op counts)."""

import numpy as np
import pytest

TINY_VIDEO = dict(
    num_attention_heads=2, attention_head_dim=16, in_channels=4,
    out_channels=4, sample_height=8, sample_width=8,
    max_text_seq_length=8, text_embed_dim=32, time_embed_dim=16,
)


@pytest.fixture(scope="module")
def bench_mod():
    import bench

    return bench


@pytest.mark.parametrize("quantize", [False, "w8", "w8a8", "w4"])
def test_video_attempt_tiny(bench_mod, quantize):
    dt, _peak = bench_mod.video_attempt(
        2, quantize, iters=2, frames=2, backend="pallas_interpret",
        cfg_overrides=TINY_VIDEO,
    )
    assert dt > 0


def test_video_ops_scale_linearly_in_layers(bench_mod):
    mm1, at1 = bench_mod.video_ops(1, 17550, 226, 4)
    mm42, at42 = bench_mod.video_ops(42, 17550, 226, 4)
    assert mm42 == 42 * mm1 and at42 == 42 * at1
    # production shape sanity: ~169 TF matmul + ~163 TF attention / forward
    assert 150e12 < mm42 < 190e12 and 140e12 < at42 < 180e12


def test_flux_denoise_ops_split(bench_mod):
    mm, at_d, at_s = bench_mod.flux_denoise_ops(19, 38, 4, 4096, 256, 4)
    assert mm > 0 and at_d > 0 and at_s > 0
    # singles run at S=4352 over 38 layers, doubles at S=4352(+concepts)
    # over 19: the single stack carries ~2x the double attention ops
    assert 1.5 < at_s / at_d < 2.5


def test_encode_rung_tiny(bench_mod):
    """Full run_encode path at flux-tiny scale on CPU — catches arg-order /
    shape bugs in the rung itself (the on-chip r05 run hit exactly one:
    loop_rate perturbs args[0], which must be an array, not the params)."""
    rec = bench_mod.run_encode(
        iters=2, size=64, depth=2, quantize="w8a8",
        backend="pallas_interpret",
        ae_cfg_overrides=dict(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                              z_channels=4),
        cfg_overrides=dict(in_channels=16, vec_in_dim=32, context_in_dim=64,
                           hidden_size=128, num_heads=4,
                           axes_dim=(8, 12, 12)),
    )
    assert rec["value"] > 0
    assert rec["vae_encode_ms"] > 0
    assert rec["stopped_forward_ms_n1"] > 0
    assert rec["stopped_forward_ms_n4"] > 0
    # image-batched eval mode (harness --image_batch 4, VAE encoder chunked
    # to 1 on TPU — the composition of the two measured pieces)
    assert rec["eval_image_batch"] == 4
    assert rec["eval_images_per_sec_batched"] > 0
    assert rec["eval_images_per_sec_batched"] > rec["value"] * 0.9
