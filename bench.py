"""Headline benchmark: flux-schnell generation + concept heatmaps.

Measures images/sec for a 4-step 1024x1024 rectified-flow generation with
4-concept saliency extraction (the BASELINE.json north-star config), plus the
heatmap-extraction overhead vs. a plain generation pass, the model FLOP
utilization against the chip's mixed-precision roofline, a
{attention, matmul, decode} phase split, and a depth-scaled bf16 companion
reading next to the int8 headline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
transparency fields ("mfu", "phases", "bf16_companion") — extra keys, same
contract.

vs_baseline: BASELINE.json targets >= 1x A100 images/sec for the full 12B
flux-schnell. The A100 constant is ~0.5 img/s (~2 s/image) for BF16
flux-schnell 4-step 1024^2: the reference repo publishes no numbers
(BASELINE.md), so this is the round-number midpoint of public community
measurements of stock bf16 flux-schnell on A100-80GB — e.g. Replicate's
flux-schnell A100 listings and BFL community benchmarks cluster at
1.7-2.2 s/image end-to-end (encode+denoise+decode) in 2024-2025 posts. NOTE
the comparison is int8-w8a8 TPU *serving* vs that bf16 A100 figure —
legitimate for a serving headline, and the bf16_companion field carries the
same-precision rung (full-depth bf16 cannot fit one 16 GB chip, so the
depth-scaled bf16 FLOP-equivalent is the honest companion). The w8a8 path's
end-to-end quality is gated in tests/test_quant.py (heatmap IoU >= 0.99 vs
fp32 on the tiny config).

Config ladder (first that fits the chip wins):
  1. full d19/38 with w8a8 int8 (true architecture; ~12 GB on a 16 GB v5e),
  2. depth-scaled bf16, throughput normalized to full-depth FLOP-equivalents.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# This host's sitecustomize resets jax_platforms to "axon,cpu" after
# registering the TPU plugin, trampling an explicit JAX_PLATFORMS env var
# (same workaround as conceptattention_tpu/__init__._honor_jax_platforms_env;
# bench.py imports the package only inside attempt(), too late).
if os.environ.get("JAX_PLATFORMS"):
    # shared policy (cpu appended for host-side staging unless the user opts
    # out) lives in the package so bench and import-time agree
    from conceptattention_tpu import resolve_jax_platforms

    jax.config.update(
        "jax_platforms", resolve_jax_platforms(os.environ["JAX_PLATFORMS"])
    )

# Persistent compile cache: full-size graphs take 2-5 min each through the
# remote compile relay; cached reloads cut a cold bench from ~20 min to ~2.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# See module docstring for sourcing; bf16 A100 end-to-end, 4-step 1024^2.
A100_FULL_FLUX_IMGS_PER_SEC = 0.5
FULL_DEPTH = (19, 38)
# v5e datasheet peaks (per chip): bf16 197 TFLOP/s, int8 394 TOP/s.
PEAK_BF16 = 197e12
PEAK_INT8 = 394e12


def flux_denoise_ops(depth, depth_single, num_steps, p_tokens, t_tokens, c_tokens,
                     hidden=3072, mlp_ratio=4.0):
    """Analytic (matmul_ops, attention_ops) per image for the denoise loop,
    counting multiply-adds as 2 ops.

    Double block per layer, per token: qkv 6*D^2, proj 2*D^2, mlp
    2*r*D^2*2 -> 2*D^2*(4 + 2r); joint attention 4*S_joint^2*D plus the
    concept pass 4*C*(C+P)*D. Single block per token: linear1 D->(3+r)D and
    linear2 (1+r)D->D -> 2*D^2*(4 + 2r).
    """
    d2 = hidden * hidden
    r = mlp_ratio
    l_tot = p_tokens + t_tokens + c_tokens
    s_joint = p_tokens + t_tokens
    s_single = p_tokens + t_tokens
    # double: qkv 2*3*D^2, proj 2*D^2, mlp 2*r*D^2*2 per token
    mm_double = depth * l_tot * d2 * 2 * (3 + 1 + 2 * r)
    # single: linear1 D->(3+r)D, linear2 (1+r)D->D per token
    mm_single = depth_single * s_single * d2 * 2 * ((3 + r) + (1 + r))
    at_double = depth * (4 * s_joint**2 * hidden
                         + 4 * c_tokens * (c_tokens + p_tokens) * hidden)
    at_single = depth_single * 4 * s_single**2 * hidden
    return (num_steps * (mm_double + mm_single),
            num_steps * at_double, num_steps * at_single)


def hbm_limit() -> float:
    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats()
        if stats and stats.get("bytes_limit"):
            return float(stats["bytes_limit"])
    except Exception:
        pass
    return 16e9  # v5e default; memory_stats absent under the axon plugin


def measure_attention_rate(batch=8, heads=24, seq=4352, head_dim=128, iters=6,
                           int8_qk=False):
    """Measured TFLOP/s of the fused flash kernel at the bench's joint-
    attention shape, via profiling.loop_rate (one in-jit fori_loop with a
    checksum fetch — per-dispatch overhead through the axon tunnel is
    30-90 ms and block_until_ready does not sync, so separate dispatches
    measure dispatch, not compute; the default (1 + i/64) perturbation is
    bf16-representable so iterations are not foldable). RoPE tables are
    passed so the probe exercises the same fused-rope (+ roped-K VMEM
    cache) code path the model runs."""
    from conceptattention_tpu.kernels.flash_saliency import (
        _auto_tiles,
        expand_rope_tables,
        fused_concept_flash_attention,
    )

    bq, bk = _auto_tiles(seq)
    key = jax.random.PRNGKey(7)
    kq, kk, kv, ka = jax.random.split(key, 4)
    q = jax.random.normal(kq, (batch, heads, seq, head_dim), jnp.bfloat16)
    k = jax.random.normal(kk, (batch, heads, seq, head_dim), jnp.bfloat16)
    v = jax.random.normal(kv, (batch, heads, seq, head_dim), jnp.bfloat16)
    ang = jax.random.uniform(ka, (batch, seq, head_dim // 2), jnp.float32, 0, 6.28)
    # Expand via the kernel's own helper so the probe always measures the
    # model's exact rotation layout (same [B, 1, N, D/2] convention embed_nd
    # produces) rather than a hand-rolled copy that could drift.
    rope_cos, rope_sin = expand_rope_tables(
        [(jnp.cos(ang)[:, None], jnp.sin(ang)[:, None])], seq
    )

    from conceptattention_tpu.utils.profiling import loop_rate

    def attn(q, k, v):
        return fused_concept_flash_attention(
            q, k, v,
            txt_len=seq, img_len=0, concept_len=0, block_q=bq, block_k=bk,
            rope_cos=rope_cos, rope_sin=rope_sin, int8_qk=int8_qk,
        )

    dt = loop_rate(attn, q, k, v, iters=iters)
    ops = 4 * seq * seq * head_dim * heads * batch  # qk + av, 2 ops per MAC
    return ops / dt


def video_ops(num_layers, s_video, s_text, c_tokens, hidden=3072, mlp_ratio=4.0):
    """Analytic (matmul_ops, attention_ops) per CogVideoX DiT forward
    (multiply-adds as 2 ops). Per block: shared qkv 6*D^2 + proj 2*D^2 per
    token over video+text(+concepts), joint FF 2*D^2*2r over video+text plus
    the concept FF; joint attention 4*S_joint^2*D plus the concept pass
    4*C*(C+P)*D."""
    d2 = hidden * hidden
    r = mlp_ratio
    s_joint = s_video + s_text
    l_tot = s_joint + c_tokens
    mm = num_layers * (l_tot * d2 * 2 * (3 + 1) + l_tot * d2 * 2 * 2 * r)
    at = num_layers * (4 * s_joint**2 * hidden
                       + 4 * c_tokens * (c_tokens + s_video) * hidden)
    return mm, at


def video_attempt(num_layers: int, quantize, batch: int = 1, iters: int = 4,
                  c_tokens: int = 4, frames: int = 13, backend: str = "pallas",
                  cfg_overrides: dict = None):
    """One CogVideoX-5b-class denoise forward with per-frame concept
    saliency at the production video shape: 13 latent frames x (30x45)
    tokens = 17,550 video tokens + 226 text + concepts, through the fused
    flash kernel (BASELINE config 5; the reference materializes the full
    17.6k^2 logits in a dense SDPA,
    reference experiments/video_model/cogvideox/modified_attention_layer.py:85-104).

    Returns (sec_per_forward, peak_hbm_bytes_or_None)."""
    from conceptattention_tpu.models.video.dit import (
        cogvideox_5b_config,
        init_video_dit_params,
        video_dit_forward,
    )
    from conceptattention_tpu.ops.attention import ConceptAttentionSpec
    from conceptattention_tpu.utils.profiling import loop_rate

    cfg = cogvideox_5b_config(num_layers=num_layers, **(cfg_overrides or {}))
    f = frames  # 49-frame 480x720 video: (49-1)/4 + 1 latent frames
    h, w = cfg.sample_height, cfg.sample_width  # 60 x 90 latents -> 30x45 tokens
    key = jax.random.PRNGKey(3)
    kp, kv, kt, kc = jax.random.split(key, 4)
    if quantize:
        from conceptattention_tpu.ops.quant import (
            init_video_dit_params_quantized,
            resolve_quant_mode,
        )

        # Direct quantized init (depth-1 skeleton + generated int8 stacks):
        # materialize-then-quantize measured ~25 min of host work on this
        # 1-core host for the 5b-class tree; this takes seconds.
        params = init_video_dit_params_quantized(
            kp, cfg, jnp.bfloat16, mode=resolve_quant_mode(quantize)
        )
    else:
        params = init_video_dit_params(kp, cfg, jnp.bfloat16)

    video = jax.random.normal(kv, (batch, f, cfg.in_channels, h, w), jnp.bfloat16)
    text = jax.random.normal(kt, (batch, cfg.max_text_seq_length,
                                  cfg.text_embed_dim), jnp.bfloat16)
    concepts = jax.random.normal(kc, (batch, c_tokens, cfg.text_embed_dim),
                                 jnp.bfloat16)
    spec = ConceptAttentionSpec(taps=("output", "cross_attention"),
                                backend=backend)

    # params ride as an ARGUMENT: closing over them bakes ~11 GB of weight
    # constants into the jitted loop (and ships them through the remote
    # compile relay). The perturbation targets the video tensor (a[1]).
    def step(p, video, text, concepts):
        t_vec = jnp.full((batch,), 999.0, jnp.float32)
        return video_dit_forward(p, cfg, video, text, t_vec,
                                 concepts=concepts, spec=spec)

    def perturb(i, a):
        scale = (1.0 + i.astype(jnp.float32) / 64.0).astype(a[1].dtype)
        return (a[0], a[1] * scale, *a[2:])

    dt = loop_rate(step, params, video, text, concepts, iters=iters,
                   perturb=perturb)
    peak = None
    try:
        stats = jax.devices()[0].memory_stats()
        if stats:
            peak = stats.get("peak_bytes_in_use")
    except Exception:
        pass
    return dt, peak


def run_video(iters: int = 4):
    """The video rung: ladder bf16 -> w8 -> w4 at full 42 layers, then
    reduced depth with FLOP-normalization (the flux bench's
    bf16_companion pattern). Returns the JSON record (metric/value/unit/
    vs_baseline + transparency extras)."""
    full_layers = 42
    s_video, s_text, c = 13 * 30 * 45, 226, 4
    # bf16 at full depth (~10 GB weights + ~3 GB of 17.8k-token activations)
    # measured RESOURCE_EXHAUSTED on the 16 GB chip; w8a8 leads (int8
    # weights ~5 GB AND int8xint8 matmuls at the 394 TOP/s MXU peak — the
    # same serving mode as the flux headline), then weight-only int8/int4,
    # then the depth-scaled bf16 rung (L14 measured fitting, L28 not).
    ladder = [
        (full_layers, "w8a8"), (full_layers, "w8"), (full_layers, "w4"),
        (14, False),
    ]
    for layers, quantize in ladder:
        try:
            dt, peak = video_attempt(layers, quantize, iters=iters, c_tokens=c)
        except Exception as e:
            import gc
            import traceback

            traceback.print_exc(limit=2, file=sys.stderr)
            print(f"# video config L{layers} q={quantize} failed: "
                  f"{type(e).__name__}", file=sys.stderr)
            e.__traceback__ = None
            del e
            gc.collect()
            # Drop compiled executables + their kept-alive operand buffers:
            # a failed larger rung otherwise pollutes the next one into a
            # spurious RESOURCE_EXHAUSTED (L14 failed inside the ladder but
            # passed standalone).
            jax.clear_caches()
            gc.collect()
            continue
        scale = layers / full_layers
        dt_full_equiv = dt / scale
        mm, at = video_ops(layers, s_video, s_text, c)
        # A 49-frame generation = 50 DDIM steps x 2 CFG forwards (reference
        # experiments/video_model/cogvideox/pipeline.py:89-435); frames/s is
        # decoded pixel frames over that denoise wall-clock (video VAE
        # excluded on both sides — the reference pipeline decodes too, but
        # BASELINE config 5 targets the per-frame *heatmap* forwards).
        frames_per_sec = 49.0 / (50 * 2 * dt_full_equiv)
        mm_peak = PEAK_INT8 if quantize == "w8a8" else PEAK_BF16
        ideal = mm / mm_peak + at / PEAK_BF16
        record = {
            "metric": (
                f"video DiT step/s cogvideox-5b-L{layers} 17550+226+4 tokens "
                f"b1 per-frame heatmaps, "
                f"{ {'w8': 'int8-weights', 'w8a8': 'int8-w8a8', 'w4': 'int4-weights'}.get(quantize, 'bf16') }, "
                f"1 chip, attn=pallas (full-depth-equiv "
                f"{1.0 / dt_full_equiv:.3f} step/s; frames/s is a derived "
                f"50-step 2x-CFG 49-frame generation rate; vs_baseline — "
                f"no published reference number exists, BASELINE.md)"
            ),
            "value": round(1.0 / dt, 4),
            "unit": "dit_steps/sec",
            "vs_baseline": None,
            "sec_per_forward": round(dt, 3),
            "frames_per_sec_derived": round(frames_per_sec, 4),
            "mfu": round(ideal / dt, 3),
        }
        try:
            # The model's fused kernel length: txt + video + the 256-padded
            # concept block (pallas_joint_concept_attention pads concepts to
            # a lane-friendly 256).
            s_fused = s_video + s_text + 256
            rate = measure_attention_rate(
                batch=1, heads=48, seq=s_fused, head_dim=64, iters=iters,
            )
            record[f"attention_tflops_s{s_fused}"] = round(rate / 1e12, 1)
        except Exception as e:
            print(f"# video attention probe skipped: {type(e).__name__}",
                  file=sys.stderr)
        if peak:
            # memory_stats' high-water mark is PROCESS-lifetime (cannot be
            # reset), so when this rung runs after the flux headline in bare
            # `python bench.py` the value reflects the larger of the two.
            record["process_peak_hbm_gb"] = round(peak / 1e9, 2)
        return record
    raise RuntimeError("no video configuration fit the device")


def run_encode(iters: int = 6, *, size: int = 1024, depth: int = 19,
               quantize: str = "w8a8", backend: str = "pallas",
               ae_cfg_overrides: dict = None, cfg_overrides: dict = None):
    """The real-image encode rung: the reference's flagship eval use case —
    VAE-encode a 1024^2 image, forward-noise, ONE stopped DiT forward
    (stop_after_multimodal_attentions: double blocks only, reference
    concept_attention_pipeline.py:204-357 + segmentation.py:85-153) — the
    path the ImageNet-Seg harness calls ~4.3k times. Measures the VAE
    encoder (NCHW; the encoder-side twin of the f32-decode on-chip compile
    bug, commit 38ab74a) and the batched stopped forward at num_samples 1
    and 4, all w8a8 like the headline. Reports images/sec per eval image
    (1 encode + 1 stopped forward at each sample count)."""
    from conceptattention_tpu.config import AutoEncoderConfig, FluxConfig
    from conceptattention_tpu.models.flux import autoencoder as vae
    from conceptattention_tpu.models.flux.dit import flux_forward
    from conceptattention_tpu.ops.attention import ConceptAttentionSpec
    from conceptattention_tpu.ops.packing import make_img_ids, pack_latents
    from conceptattention_tpu.ops.quant import (
        init_flux_params_quantized,
        resolve_quant_mode,
    )
    from conceptattention_tpu.utils.profiling import loop_rate

    cfg = FluxConfig(depth=depth, depth_single_blocks=2 * depth,
                     guidance_embed=False, **(cfg_overrides or {}))
    dtype = jnp.bfloat16
    t, c = (16 if cfg_overrides else 256), 4  # tiny test config: short text
    key = jax.random.PRNGKey(11)
    keys = jax.random.split(key, 4)
    params = init_flux_params_quantized(
        keys[0], cfg, dtype, mode=resolve_quant_mode(quantize)
    )
    ae_cfg = AutoEncoderConfig(**(ae_cfg_overrides or {}))
    ae_params = vae.init_autoencoder_params(keys[1], ae_cfg, dtype)
    # pixels -> z_channels latents at size/vae_factor -> 2x2-packed tokens
    vae_factor = 2 ** (len(ae_cfg.ch_mult) - 1)
    grid = size // vae_factor // 2

    # --- VAE encoder (NCHW fast path, the pipeline's _encode_pixels route,
    # concept_pipeline.py) ---
    x = jax.random.uniform(keys[2], (1, 3, size, size), dtype, -1.0, 1.0)

    def enc(x, ae_params):
        # Array arg FIRST: loop_rate's default perturbation scales args[0]
        # to keep iterations non-foldable (a dict there has no .dtype).
        return vae.encode(ae_params, ae_cfg, x)

    t_vae = loop_rate(enc, x, ae_params, iters=iters)

    # --- stopped forward (double blocks only) at n samples ---
    spec = ConceptAttentionSpec(taps=("output", "cross_attention"),
                                backend=backend)

    def stopped(n):
        kz, kt, kc = jax.random.split(keys[3], 3)
        z = jax.random.normal(kz, (n, ae_cfg.z_channels, 2 * grid, 2 * grid),
                              dtype)
        img = pack_latents(z)
        img_ids = make_img_ids(grid, grid, n)
        txt = jax.random.normal(kt, (n, t, cfg.context_in_dim), dtype)
        txt_ids = jnp.zeros((n, t, 3), jnp.float32)
        vec = jnp.zeros((n, cfg.vec_in_dim), dtype)
        con = jax.random.normal(kc, (n, c, cfg.context_in_dim), dtype)
        con_ids = jnp.zeros((n, c, 3), jnp.float32)
        t_vec = jnp.full((n,), 0.5, jnp.float32)

        def fwd(img, params):
            _, sal = flux_forward(
                params, cfg, img=img, img_ids=img_ids, txt=txt,
                txt_ids=txt_ids, timesteps=t_vec, y=vec,
                concepts=con, concept_ids=con_ids, concept_vec=vec,
                stop_after_multimodal_attentions=True, spec=spec,
            )
            return sal
        return loop_rate(fwd, img, params, iters=iters)

    t_fwd1 = stopped(1)
    t_fwd4 = stopped(4)

    # --- image-batched eval mode (harness --image_batch 4): the stopped
    # forward batches 4 images per dispatch (shape-identical to n4 — the
    # measurement above — since per-image text/concepts change values, not
    # shapes) while the VAE encoder stays per-image. Batching the ENCODER
    # was measured RESOURCE_EXHAUSTED at 1024^2 B in {8, 4, 2} next to the
    # resident d19 DiT (its first-stage activations; one failed alloc also
    # poisons later smaller attempts in-session), and at ~73 ms it is <15%
    # of the eval cost, so the pipeline chunks it to 1 on TPU
    # (_encode_pixels_batch) — this field is the composition of the two
    # loop_rate numbers the harness therefore pays per 4-image batch.
    eval_batched = {
        "eval_image_batch": 4,
        "vae_encoder_chunk": 1,
        "eval_images_per_sec_batched": round(4.0 / (4 * t_vae + t_fwd4), 4),
        "imagenet_seg_4.3k_est_min_batched": round(
            4300 * (t_vae + t_fwd4 / 4) / 60, 1),
    }

    record = {
        "metric": (
            "encode-path images/sec flux-schnell-d19 1024px stopped forward "
            "(stop_after_multimodal_attentions) + 4-concept taps, int8-w8a8, "
            "1 chip, attn=pallas (per eval image = one 1024^2 VAE encode + "
            "one stopped forward; n4 batches 4 noise samples per image as "
            "the eval harness does; sizes the ~4.3k-image ImageNet-Seg run)"
        ),
        "value": round(1.0 / (t_vae + t_fwd1), 4),
        "unit": "images/sec",
        "vs_baseline": None,
        "vae_encode_ms": round(t_vae * 1000, 1),
        "stopped_forward_ms_n1": round(t_fwd1 * 1000, 1),
        "stopped_forward_ms_n4": round(t_fwd4 * 1000, 1),
        "images_per_sec_n4_samples": round(1.0 / (t_vae + t_fwd4), 4),
        "imagenet_seg_4.3k_est_min_n1": round(
            4300 * (t_vae + t_fwd1) / 60, 1),
        **eval_batched,
    }
    return record


# Public community A100 numbers for bf16 flux-dev 50-step 1024^2 cluster at
# 20-30 s/image end-to-end (same 2024-2025 sources as the schnell constant);
# 0.04 img/s is the round-number midpoint. Same caveat as the headline: the
# TPU rung is int8 serving vs that bf16 figure.
A100_FULL_FLUX_DEV_IMGS_PER_SEC = 0.04


def run_flux_dev(iters: int = 2):
    """BASELINE config 3: flux-dev — guidance-distilled (guidance_embed=True,
    reference flux/src/flux/model.py + sampling.py:67-94 time-shifted
    schedule), 50 steps, per-timestep saliency collected for ALL steps at
    production shape (the per-timestep sweep's chip path: the scan stacks a
    [50, 19, B, C, 4096] fp32 stash per tap — 62 MB/tap at B=1)."""
    n = max(1, int(hbm_limit() * 0.5 / 1.25e9))
    ladder = [
        (19, 38, "w8a8", ("pallas",), 1),
        (19, 38, "w8", ("pallas",), 1),
        (min(19, n), min(38, 2 * n), False, ("pallas",), 1),
    ]
    for depth, depth_single, quantize, backends, batch in ladder:
        try:
            (imgs_per_sec, overhead_pct, backend, t_with, t_nodecode,
             overhead_spread, overhead_method) = attempt(
                depth, depth_single, quantize, backends, batch,
                num_steps=50, shift=True, guidance_embed=True, guidance=3.5,
                iters=iters, overhead_pairs=2, injit_overhead=True,
            )
        except Exception as e:
            import gc
            import traceback

            traceback.print_exc(limit=2, file=sys.stderr)
            print(f"# flux-dev d{depth}/{depth_single} q={quantize} failed: "
                  f"{type(e).__name__}", file=sys.stderr)
            e.__traceback__ = None
            del e
            gc.collect()
            continue
        flop_scale = ((depth + 0.5 * depth_single)
                      / (FULL_DEPTH[0] + 0.5 * FULL_DEPTH[1]))
        full_equiv = imgs_per_sec * flop_scale
        record = {
            "metric": (
                f"images/sec flux-dev-d{depth}/{depth_single} 1024px 50-step "
                f"shifted-schedule guidance=3.5 b{batch} 4-concept per-step "
                f"heatmaps + VAE decode, "
                f"{ {'w8a8': 'int8-w8a8', 'w8': 'int8-weights'}.get(quantize, 'bf16') }, "
                f"1 chip, attn={backend} (full-depth-equiv {full_equiv:.4f} "
                f"img/s, heatmap overhead {overhead_pct:.1f}% via "
                f"{overhead_method}; per-step "
                f"saliency stash [50, {depth}, {batch}, 4, 4096] x2 taps "
                f"resident, bf16)"
            ),
            "value": round(imgs_per_sec, 4),
            "unit": "images/sec",
            "vs_baseline": round(
                full_equiv / A100_FULL_FLUX_DEV_IMGS_PER_SEC, 3),
            "sec_per_image": round(1.0 / imgs_per_sec, 2),
            "heatmap_overhead_pct": round(overhead_pct, 2),
            "heatmap_overhead_method": overhead_method,
            "heatmap_overhead_spread_pct": [round(overhead_spread[0], 2),
                                            round(overhead_spread[1], 2)],
        }
        try:
            stats = jax.devices()[0].memory_stats()
            if stats and stats.get("peak_bytes_in_use"):
                # process-lifetime high-water mark (see run_video's note)
                record["process_peak_hbm_gb"] = round(
                    stats["peak_bytes_in_use"] / 1e9, 2)
        except Exception:
            pass
        return record
    raise RuntimeError("no flux-dev configuration fit the device")


def attempt(depth: int, depth_single: int, quantize: bool, backends,
            batch: int = 1, num_steps: int = 4, shift: bool = False,
            guidance_embed: bool = False, guidance: float = 0.0,
            iters: int = 6, overhead_pairs: int = 2,
            injit_overhead: bool = False):
    from conceptattention_tpu.config import AutoEncoderConfig, FluxConfig
    from conceptattention_tpu.models.flux import autoencoder as vae
    from conceptattention_tpu.models.flux.params import init_flux_params
    from conceptattention_tpu.ops.attention import ConceptAttentionSpec
    from conceptattention_tpu.ops.packing import make_img_ids, unpack_latents
    from conceptattention_tpu.ops.schedule import get_schedule
    from conceptattention_tpu.sampling.rectified_flow import denoise

    cfg = FluxConfig(depth=depth, depth_single_blocks=depth_single,
                     guidance_embed=guidance_embed)
    dtype = jnp.bfloat16
    b, t, c = batch, 256, 4
    grid = (64, 64)  # 1024x1024 pixels -> 4096 image tokens
    p_tokens = grid[0] * grid[1]

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 6)
    if quantize:  # "w8" (weight-only int8) | "w8a8" | "w4" (group int4)
        from conceptattention_tpu.ops.quant import (
            init_flux_params_quantized,
            resolve_quant_mode,
        )

        params = init_flux_params_quantized(
            keys[0], cfg, dtype, mode=resolve_quant_mode(quantize)
        )
    else:
        params = init_flux_params(keys[0], cfg, dtype)
    img = jax.random.normal(keys[1], (b, p_tokens, cfg.in_channels), dtype)
    img_ids = make_img_ids(*grid, batch_size=b)
    txt = jax.random.normal(keys[2], (b, t, cfg.context_in_dim), dtype)
    txt_ids = jnp.zeros((b, t, 3), jnp.float32)
    y = jax.random.normal(keys[3], (b, cfg.vec_in_dim), dtype)
    concepts = jax.random.normal(keys[4], (b, c, cfg.context_in_dim), dtype)
    concept_ids = jnp.zeros((b, c, 3), jnp.float32)
    concept_vec = jnp.zeros((b, cfg.vec_in_dim), dtype)
    schedule = jnp.asarray(get_schedule(num_steps, p_tokens, shift=shift))
    # VAE decode is part of the measured path (an A100 "full flux-schnell"
    # img/s number includes it). Decoded per-image under lax.map to bound the
    # 1024^2 conv activations next to the 12 GB of DiT weights.
    ae_cfg = AutoEncoderConfig()
    ae_params = vae.init_autoencoder_params(keys[5], ae_cfg, dtype)

    import functools

    @functools.partial(jax.jit, static_argnames=("with_concepts", "backend"))
    def run(params, img, with_concepts, backend):
        # "<backend>+i8" races the int8_qk variant (int8 x int8 attention
        # scores on the MXU); the min() pick below keeps it only if it wins.
        name, _, i8 = backend.partition("+")
        out, sal = denoise(
            params, cfg,
            img=img, img_ids=img_ids, txt=txt, txt_ids=txt_ids, vec=y,
            timesteps=schedule, guidance=guidance,
            concepts=concepts if with_concepts else None,
            concept_ids=concept_ids if with_concepts else None,
            concept_vec=concept_vec if with_concepts else None,
            spec=ConceptAttentionSpec(taps=("output", "cross_attention"),
                                      backend=name, int8_qk=(i8 == "i8"),
                                      stash_dtype="bf16"),  # production cfg:
            # the pipeline stashes bf16 on TPU (halves the 50-step flux-dev
            # stash that pushed heatmap overhead past the <5% gate in r05)
        )
        # Scalar checksum: fetching it to host forces the full computation.
        # (On the axon backend block_until_ready does NOT synchronize device
        # compute — only a host fetch does.)
        chk = jnp.sum(out.astype(jnp.float32))
        if with_concepts:
            chk = chk + sal["output"].mean()
        return chk, out

    # Decode as its own dispatch: folding the 1024^2 conv stack into the
    # 12 GB denoise graph measurably degrades both (memory-pressure
    # scheduling); two back-to-back device graphs carry no such penalty.
    @jax.jit
    def run_decode(ae_params, out):
        z = unpack_latents(out, *grid)
        pixels = jax.lax.map(
            lambda zi: vae.decode_nhwc(ae_params, ae_cfg, zi[None])[0], z
        )
        return jnp.sum(pixels.astype(jnp.float32))

    def timed(with_concepts, backend, iters=iters, decode=True):
        # 6 iters: the heatmap-overhead number is the RATIO of two separately
        # timed loops; at 4 iters its run-to-run spread was 0-6%.
        chk, out = run(params, img, with_concepts, backend)  # compile + warm
        float(chk)
        float(run_decode(ae_params, out))
        t0 = time.perf_counter()
        chks = []
        for i in range(iters):
            # Perturbation must survive bf16 rounding (1 + 1e-4 rounds to
            # exactly 1.0 at bf16's 2^-7 spacing, making iterations
            # bit-identical); 1 + i/64 steps are exactly representable.
            chk, out = run(params, img * (1.0 + i / 64.0), with_concepts, backend)
            chks.append(chk)
            if decode:
                chks.append(run_decode(ae_params, out))
        for c_ in chks:  # deferred fetch: throughput semantics, true sync
            float(c_)
        return (time.perf_counter() - t0) / iters

    results = {}
    for backend in backends:
        try:
            results[backend] = timed(True, backend)
        except Exception as e:
            print(f"# backend {backend} failed: {type(e).__name__}", file=sys.stderr)
    if not results:
        raise RuntimeError("all backends failed")
    backend = min(results, key=results.get)
    # Heatmap overhead as an INTERLEAVED paired measurement: with/without
    # loops alternate within one session (w p w p w ...), each plain loop
    # scored against the mean of its two with-loop neighbors, so chip/tunnel
    # drift between loops cannot masquerade as overhead (the round-4 method —
    # the ratio of two separately timed loops — read anywhere from 1.0% to
    # 5.8% for the same code, straddling BASELINE.md's <5% gate).
    ts_with = [results[backend]]
    ratios = []
    for _ in range(max(1, overhead_pairs)):
        t_plain = timed(False, backend)
        ts_with.append(timed(True, backend))
        tw = 0.5 * (ts_with[-2] + ts_with[-1])
        ratios.append(max(0.0, 100.0 * (tw - t_plain) / t_plain))
    overhead = sum(ratios) / len(ratios)
    overhead_spread = (min(ratios), max(ratios))
    overhead_method = "interleaved_paired_host"
    # Steady-state throughput: mean of the with-loops (each already a
    # multi-iteration in-session loop).
    t_with = sum(ts_with) / len(ts_with)
    # Denoise-only time for the phase split / MFU: same compiled fns, no
    # extra compile — the decode loop is simply not dispatched.
    t_nodecode = timed(True, backend, decode=False)
    if injit_overhead:
        # Host-timed paired loops still see the tunnel's between-loop drift
        # (flux-dev b1 2-iter loops read a 4.1-18.3% spread in one session).
        # The drift-immune instrument is the in-jit fori_loop: both arms run
        # entirely on device inside ONE dispatch each, so the ratio is pure
        # device compute (the technique every phase probe here uses).
        # Denoise-only ratio; decode (identical in both arms) would only
        # dilute it, so this upper-bounds the end-to-end overhead.
        from conceptattention_tpu.utils.profiling import loop_rate

        name, _, i8 = backend.partition("+")
        spec_sal = ConceptAttentionSpec(
            taps=("output", "cross_attention"), backend=name,
            int8_qk=(i8 == "i8"), stash_dtype="bf16")

        def d_sal(img, params):
            out, sal = denoise(
                params, cfg, img=img, img_ids=img_ids, txt=txt,
                txt_ids=txt_ids, vec=y, timesteps=schedule, guidance=guidance,
                concepts=concepts, concept_ids=concept_ids,
                concept_vec=concept_vec, spec=spec_sal)
            return out, sal["output"]

        def d_plain(img, params):
            out, _ = denoise(
                params, cfg, img=img, img_ids=img_ids, txt=txt,
                txt_ids=txt_ids, vec=y, timesteps=schedule, guidance=guidance)
            return out

        try:
            t_sal = loop_rate(d_sal, img, params, iters=2)
            t_plain = loop_rate(d_plain, img, params, iters=2)
        except Exception as e:
            # The remote compile relay 500s on the biggest fori(scan(model))
            # graphs (observed at d19/38 50-step); the probe must never take
            # the whole rung down the ladder — fall back to the host-paired
            # overhead already computed above (or its absence).
            print(f"# in-jit overhead probe failed ({type(e).__name__}); "
                  f"keeping host-paired overhead", file=sys.stderr)
            e.__traceback__ = None
        else:
            overhead = max(0.0, 100.0 * (t_sal - t_plain) / t_plain)
            overhead_spread = (overhead, overhead)  # single in-jit number
            overhead_method = "injit_fori_denoise_ratio"
    return (b / t_with, overhead, backend, t_with, t_nodecode,
            overhead_spread, overhead_method)


def _require_accelerator(timeout_s: float = 300.0):
    """Fail fast (exit 3, no JSON on stdout) when no accelerator is usable.

    Two failure modes this guards:
      - the axon tunnel is DOWN: jax.devices() hangs forever with no error
        (observed outages of 1h+), which would hang the whole bench run —
        probe device init in a daemon thread with a hard timeout instead;
      - the axon plugin errors and JAX silently falls back to CPU: a "bench"
        number measured on CPU is meaningless and takes hours — refuse unless
        BENCH_ALLOW_CPU=1 (debugging only).
    """
    import threading

    got = {}

    def probe():
        try:
            got["devices"] = jax.devices()
        except Exception as e:  # plugin init error
            got["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in got:
        print(
            f"bench: accelerator unreachable: "
            f"{got.get('error', f'device init did not finish in {timeout_s:.0f}s (axon tunnel down?)')}",
            file=sys.stderr,
        )
        raise SystemExit(3)
    platform = got["devices"][0].platform.lower()
    if platform == "cpu" and os.environ.get("BENCH_ALLOW_CPU") != "1":
        print(
            "bench: resolved to the CPU backend — refusing to print a CPU "
            "number as the headline (set BENCH_ALLOW_CPU=1 to override for "
            "debugging)",
            file=sys.stderr,
        )
        raise SystemExit(3)
    return got["devices"]


def _cli_ladder(argv):
    """Optional overrides: `python bench.py --quantize w4 --batch 16
    [--backends pallas,...]` pins a single full-depth rung instead of the
    default ladder (how the README's non-headline rows — e.g. the w4
    capacity numbers — are reproduced). Bare `python bench.py` (the driver
    contract) is unchanged."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--quantize", default=None,
                   choices=["w8", "w8a8", "w4", "bf16"])
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--backends", default=None, help="comma-separated")
    p.add_argument("--video", action="store_true",
                   help="run ONLY the video rung (cogvideox-5b shape, "
                        "17.8k tokens) and print its JSON line")
    p.add_argument("--flux_dev", action="store_true",
                   help="run ONLY the flux-dev 50-step shifted-schedule "
                        "rung and print its JSON line")
    p.add_argument("--encode", action="store_true",
                   help="run ONLY the real-image encode rung (1024^2 VAE "
                        "encode + stopped forward) and print its JSON line")
    a = p.parse_args(argv)
    if a.video:
        return "video"
    if a.flux_dev:
        return "flux_dev"
    if a.encode:
        return "encode"
    if a.quantize is None and a.batch is None and a.backends is None:
        return None
    quantize = False if a.quantize in (None, "bf16") else a.quantize
    backends = tuple((a.backends or "pallas").split(","))
    return [(19, 38, quantize, backends, a.batch or 8)]


def main(argv=None):
    cli = _cli_ladder(argv if argv is not None else sys.argv[1:])
    _require_accelerator()
    if cli == "video":
        print(json.dumps(run_video()))
        return
    if cli == "flux_dev":
        print(json.dumps(run_flux_dev()))
        return
    if cli == "encode":
        print(json.dumps(run_encode()))
        return
    hbm = hbm_limit()
    if cli is not None:
        ladder = cli
    elif hbm >= 26e9:
        ladder = [(19, 38, False, ("xla", "pallas"), 1)]
    else:
        # int8 full depth first (XLA attention's materialized logits don't fit
        # alongside the weights -> flash kernel only), then depth-scaled bf16.
        n = max(1, int(hbm * 0.5 / 1.25e9))
        ladder = [
            (19, 38, "w8a8", ("pallas", "pallas+i8"), 8),  # full arch, int8 MXU serving
            (19, 38, "w8a8", ("pallas",), 4),
            (19, 38, "w8", ("pallas",), 4),    # full arch, int8 weights only
            (19, 38, "w8", ("pallas",), 1),    # full arch, int8, single image
            (min(19, n), min(38, 2 * n), False, ("xla", "pallas"), 1),
        ]
    n_bf = max(1, int(hbm * 0.5 / 1.25e9))
    # b4 measured 0.773x vs b1's 0.705x (better dispatch amortization); b1
    # stays as the fallback rung if activations OOM on a smaller chip.
    bf16_rungs = [
        (min(19, n_bf), min(38, 2 * n_bf), False, ("pallas",), 4),
        (min(19, n_bf), min(38, 2 * n_bf), False, ("pallas", "xla"), 1),
    ]

    for depth, depth_single, quantize, backends, batch in ladder:
        try:
            try:
                (imgs_per_sec, overhead_pct, backend, t_with, t_nodecode,
                 overhead_spread, _om) = attempt(
                    depth, depth_single, quantize, backends, batch
                )
            except Exception as first:
                # The remote-compile relay occasionally 500s transiently;
                # one retry before falling down the ladder.
                print(f"# retrying after {type(first).__name__}", file=sys.stderr)
                first.__traceback__ = None
                del first
                import gc as _gc

                _gc.collect()
                (imgs_per_sec, overhead_pct, backend, t_with, t_nodecode,
                 overhead_spread, _om) = attempt(
                    depth, depth_single, quantize, backends, batch
                )
        except Exception as e:
            import gc
            import traceback

            traceback.print_exc(limit=3, file=sys.stderr)
            print(f"# config d{depth}/{depth_single} q={quantize} b{batch} failed: "
                  f"{type(e).__name__}", file=sys.stderr)
            # Drop the traceback: its frames pin the attempt's 12 GB of
            # device buffers, OOMing every later ladder entry.
            e.__traceback__ = None
            del e
            gc.collect()
            continue
        flop_scale = (depth + 0.5 * depth_single) / (FULL_DEPTH[0] + 0.5 * FULL_DEPTH[1])
        full_equiv = imgs_per_sec * flop_scale
        vs_baseline = full_equiv / A100_FULL_FLUX_IMGS_PER_SEC

        # ---- transparency extras (no extra full-size compiles) ----
        mm_ops, at_double, at_single = flux_denoise_ops(
            depth, depth_single, 4, 4096, 256, 4
        )
        mm_ops *= batch
        at_double *= batch
        at_single *= batch
        at_ops = at_double + at_single
        t_denoise = t_nodecode
        t_decode = max(0.0, t_with - t_nodecode)
        # Mixed-precision roofline: matmuls ride the int8 MXU path under
        # w8a8, attention stays bf16 — ideal time weights each phase by its
        # own peak; MFU = ideal / measured (denoise only; decode is reported
        # as its own phase share).
        mm_peak = PEAK_INT8 if quantize == "w8a8" else PEAK_BF16
        ideal_t = mm_ops / mm_peak + at_ops / PEAK_BF16
        mfu = ideal_t / t_denoise if t_denoise > 0 else 0.0
        phases = {}
        try:
            # In-jit kernel microbenches at BOTH shapes the model actually
            # runs — the doubles' fused concept shape (S=4608: txt+img+256-
            # padded concepts) and the singles' joint shape (S=4352) — each
            # weighted by its analytic op count. One shape alone
            # misattributes the phase split: the two tile configs measure
            # different TFLOP/s (round-3 Weak #2). (Device traces break on
            # the axon backend, so this ablation IS the profiler.)
            i8 = backend.endswith("+i8")
            rate_doubles = measure_attention_rate(batch=batch, seq=4608, int8_qk=i8)
            rate_singles = measure_attention_rate(batch=batch, seq=4352, int8_qk=i8)
            t_attn = at_double / rate_doubles + at_single / rate_singles
            attn_rate = at_ops / t_attn  # ops-weighted harmonic blend
            phases = {
                "attention_pct": round(100.0 * t_attn / t_with, 1),
                "matmul_pct": round(100.0 * (t_denoise - t_attn) / t_with, 1),
                "decode_pct": round(100.0 * t_decode / t_with, 1),
                "attention_tflops_measured": round(attn_rate / 1e12, 1),
                "attention_tflops_s4608": round(rate_doubles / 1e12, 1),
                "attention_tflops_s4352": round(rate_singles / 1e12, 1),
            }
        except Exception as e:
            print(f"# phase split skipped: {type(e).__name__}", file=sys.stderr)

        bf16_companion = None
        if quantize:
            for d2, s2, q2, be2, b2 in bf16_rungs:
                try:
                    bf_imgs, _, bf_backend, _, _, _, _ = attempt(
                        d2, s2, q2, be2, b2, overhead_pairs=1)
                except Exception as e:
                    print(f"# bf16 companion b{b2} skipped: {type(e).__name__}",
                          file=sys.stderr)
                    continue
                bf_scale = (d2 + 0.5 * s2) / (FULL_DEPTH[0] + 0.5 * FULL_DEPTH[1])
                bf_equiv = bf_imgs * bf_scale
                bf16_companion = {
                    "config": f"d{d2}/{s2} b{b2} bf16 attn={bf_backend}",
                    "imgs_per_sec": round(bf_imgs, 4),
                    "full_depth_equiv": round(bf_equiv, 4),
                    "vs_baseline": round(bf_equiv / A100_FULL_FLUX_IMGS_PER_SEC, 3),
                }
                break

        record = {
            "metric": (
                f"images/sec flux-schnell-d{depth}/{depth_single} 1024px 4-step b{batch} "
                f"4-concept heatmaps + VAE decode, "
                f"{ {'w8a8': 'int8-w8a8', 'w8': 'int8-weights', 'w4': 'int4-weights'}.get(quantize, 'bf16') }, "
                f"1 chip, attn={backend} "
                f"(full-depth-equiv {full_equiv:.3f} img/s over 3 in-session "
                f"loops, heatmap overhead {overhead_pct:.1f}% interleaved-"
                f"paired; vs_baseline compares "
                f"int8 serving to a ~0.5 img/s public bf16 A100 figure — see "
                f"bf16_companion for the same-precision rung)"
            ),
            "value": round(imgs_per_sec, 4),
            "unit": "images/sec",
            "vs_baseline": round(vs_baseline, 3),
            "mfu": round(mfu, 3),
            "heatmap_overhead_pct": round(overhead_pct, 2),
            "heatmap_overhead_spread_pct": [round(overhead_spread[0], 2),
                                            round(overhead_spread[1], 2)],
            "phases": phases,
        }
        if bf16_companion:
            record["bf16_companion"] = bf16_companion
        # Video rung (BASELINE config 5) rides the same JSON line as a
        # transparency field so the driver contract stays one line; its
        # failure must never take down the flux headline. BENCH_SKIP_VIDEO=1
        # opts out (saves ~5 min of compile when iterating on flux rungs).
        if os.environ.get("BENCH_SKIP_VIDEO") != "1" and cli is None:
            try:
                record["video"] = run_video()
            except Exception as e:
                print(f"# video rung skipped: {type(e).__name__}: {e}",
                      file=sys.stderr)
        if os.environ.get("BENCH_SKIP_FLUXDEV") != "1" and cli is None:
            try:
                record["flux_dev"] = run_flux_dev()
            except Exception as e:
                print(f"# flux-dev rung skipped: {type(e).__name__}: {e}",
                      file=sys.stderr)
        if os.environ.get("BENCH_SKIP_ENCODE") != "1" and cli is None:
            try:
                record["encode"] = run_encode()
            except Exception as e:
                print(f"# encode rung skipped: {type(e).__name__}: {e}",
                      file=sys.stderr)
        print(json.dumps(record))
        return
    raise SystemExit("no benchmark configuration fit the device")


if __name__ == "__main__":
    main()
