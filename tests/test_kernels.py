"""Pallas fused dual-pass flash-attention kernel vs. the XLA reference path.

Runs in interpreter mode on CPU (the driver benches the compiled kernel on
real TPU hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conceptattention_tpu.kernels.flash_saliency import (
    fused_concept_flash_attention,
    pallas_joint_concept_attention,
)
from conceptattention_tpu.ops.attention import (
    ConceptAttentionSpec,
    joint_concept_attention,
    sdpa,
)
from conceptattention_tpu.ops.packing import make_img_ids
from conceptattention_tpu.ops.rope import embed_nd

B, H, D = 1, 2, 32
T, P, C = 8, 48, 3  # txt, img, concepts
AXES = (8, 12, 12)
BQ = BK = 16


def make_qkv(key, l):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (B, H, l, D)) for k in ks)


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    txt_qkv = make_qkv(k1, T)
    img_qkv = make_qkv(k2, P)
    con_qkv = make_qkv(k3, C)
    img_ids = make_img_ids(6, 8)  # 48 tokens
    txt_ids = jnp.zeros((1, T, 3))
    con_ids = jnp.zeros((1, C, 3))
    pe = embed_nd(jnp.concatenate([txt_ids, img_ids], 1), AXES, 10_000)
    cpe = embed_nd(jnp.concatenate([con_ids, img_ids], 1), AXES, 10_000)
    return txt_qkv, img_qkv, con_qkv, pe, cpe


class TestFusedKernelRaw:
    def test_plain_flash_matches_sdpa(self):
        """No concepts: the kernel is a vanilla flash attention."""
        key = jax.random.PRNGKey(1)
        s = T + P  # 56 -> pad to 64
        q, k, v = make_qkv(key, s)
        s_pad = 64
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        out = fused_concept_flash_attention(
            jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad),
            txt_len=T, img_len=P, concept_len=0,
            block_q=BQ, block_k=BK, interpret=True,
        )
        want = sdpa(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out[:, :, :s]), np.asarray(want), rtol=2e-4, atol=2e-5
        )
        # padded rows are exactly zero
        np.testing.assert_array_equal(np.asarray(out[:, :, s:]), 0.0)

    def test_int8_qk_close_to_exact(self):
        """int8-QK serving mode: per-row-quantized int8 scores (MXU int8 path)
        stay within quantization tolerance of the exact kernel, padded rows
        stay exactly zero, and the concept mask semantics are unchanged."""
        key = jax.random.PRNGKey(7)
        s = 256
        txt, img, cpad = 32, 192, 32  # 16 real concepts + pad
        q, k, v = make_qkv(key, s)
        kw = dict(txt_len=txt, img_len=img, concept_len=16,
                  block_q=64, block_k=64, interpret=True)
        exact = fused_concept_flash_attention(q, k, v, **kw)
        got = fused_concept_flash_attention(q, k, v, int8_qk=True, **kw)
        diff = np.abs(np.asarray(exact) - np.asarray(got))
        assert diff.max() < 0.05, diff.max()
        assert diff.mean() < 0.005, diff.mean()
        # padded concept rows are exact zeros in both
        np.testing.assert_array_equal(np.asarray(got[:, :, txt + img + 16:]), 0.0)

    def test_int8_qk_with_fused_rope(self):
        """int8 quantization happens AFTER the in-kernel RoPE rotation; the
        rotated-q cache and the int8 cache must agree with the exact path."""
        key = jax.random.PRNGKey(8)
        s = 128
        q, k, v = make_qkv(key, s)
        cos = jnp.ones((B, s, D), jnp.float32)
        sin = jnp.zeros((B, s, D), jnp.float32)
        kw = dict(txt_len=32, img_len=96, concept_len=0,
                  block_q=32, block_k=32, interpret=True,
                  rope_cos=cos, rope_sin=sin)
        exact = fused_concept_flash_attention(q, k, v, **kw)
        got = fused_concept_flash_attention(q, k, v, int8_qk=True, **kw)
        diff = np.abs(np.asarray(exact) - np.asarray(got))
        assert diff.max() < 0.05, diff.max()

    @pytest.mark.parametrize(
        "cross,self_attn", [(True, True), (True, False), (False, True)]
    )
    def test_concept_mask_semantics(self, data, cross, self_attn):
        """Concept rows see [img|concept] per the ablation flags; joint rows
        never see concepts."""
        txt_qkv, img_qkv, con_qkv, pe, cpe = data
        got = pallas_joint_concept_attention(
            txt_qkv, img_qkv, con_qkv, pe, cpe,
            cross=cross, self_attention=self_attn,
            block_q=BQ, block_k=BK, interpret=True,
        )
        want = joint_concept_attention(
            txt_qkv, img_qkv, con_qkv, pe, cpe,
            ConceptAttentionSpec(cross_attention=cross, self_attention=self_attn),
        )
        for g, w, name in zip(got[:3], want[:3], ("txt", "img", "concept")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-5,
                err_msg=f"{name} cross={cross} self={self_attn}",
            )

    def test_no_concepts_path(self, data):
        txt_qkv, img_qkv, _, pe, _ = data
        got = pallas_joint_concept_attention(
            txt_qkv, img_qkv, None, pe, None,
            block_q=BQ, block_k=BK, interpret=True,
        )
        want = joint_concept_attention(txt_qkv, img_qkv, None, pe, None)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]), rtol=5e-4, atol=5e-5)

    def test_neither_ablation_passes_values(self, data):
        txt_qkv, img_qkv, con_qkv, pe, cpe = data
        got = pallas_joint_concept_attention(
            txt_qkv, img_qkv, con_qkv, pe, cpe,
            cross=False, self_attention=False,
            block_q=BQ, block_k=BK, interpret=True,
        )
        want = joint_concept_attention(
            txt_qkv, img_qkv, con_qkv, pe, cpe,
            ConceptAttentionSpec(cross_attention=False, self_attention=False),
        )
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]), rtol=1e-5)


class TestKernelInBlock:
    def test_double_block_pallas_backend_matches_xla(self, data):
        from conceptattention_tpu.config import configs
        from conceptattention_tpu.models.flux.blocks import double_block
        from conceptattention_tpu.models.flux.params import _double_block

        cfg = configs["flux-tiny"].params
        key = jax.random.PRNGKey(5)
        keys = jax.random.split(key, 6)
        p = _double_block(keys[0], cfg, jnp.float32)
        img = jax.random.normal(keys[1], (1, P, cfg.hidden_size)) * 0.5
        txt = jax.random.normal(keys[2], (1, T, cfg.hidden_size)) * 0.5
        vec = jax.random.normal(keys[3], (1, cfg.hidden_size)) * 0.5
        concepts = jax.random.normal(keys[4], (1, C, cfg.hidden_size)) * 0.5
        cvec = jax.random.normal(keys[5], (1, cfg.hidden_size)) * 0.5
        _, _, _, pe, cpe = data

        outs = {}
        for backend in ("xla", "pallas_interpret"):
            outs[backend] = double_block(
                p, img, txt, vec, pe, cfg.num_heads,
                concepts=concepts, concept_vec=cvec, concept_pe=cpe,
                spec=ConceptAttentionSpec(backend=backend),
            )
        for i, name in [(0, "img"), (1, "txt"), (2, "concepts")]:
            np.testing.assert_allclose(
                np.asarray(outs["xla"][i]), np.asarray(outs["pallas_interpret"][i]),
                rtol=1e-3, atol=1e-4, err_msg=name,
            )
        np.testing.assert_allclose(
            np.asarray(outs["xla"][3]["output"]),
            np.asarray(outs["pallas_interpret"][3]["output"]),
            rtol=1e-3, atol=1e-4,
        )

    def test_double_block_int8_qk_spec(self, data):
        """ConceptAttentionSpec(int8_qk=True) reaches the kernel's cached
        int8 score path and stays close to the exact backend."""
        from conceptattention_tpu.config import configs
        from conceptattention_tpu.models.flux.blocks import double_block
        from conceptattention_tpu.models.flux.params import _double_block

        cfg = configs["flux-tiny"].params
        key = jax.random.PRNGKey(5)
        keys = jax.random.split(key, 6)
        p = _double_block(keys[0], cfg, jnp.float32)
        img = jax.random.normal(keys[1], (1, P, cfg.hidden_size)) * 0.5
        txt = jax.random.normal(keys[2], (1, T, cfg.hidden_size)) * 0.5
        vec = jax.random.normal(keys[3], (1, cfg.hidden_size)) * 0.5
        concepts = jax.random.normal(keys[4], (1, C, cfg.hidden_size)) * 0.5
        cvec = jax.random.normal(keys[5], (1, cfg.hidden_size)) * 0.5
        _, _, _, pe, cpe = data

        exact = double_block(
            p, img, txt, vec, pe, cfg.num_heads,
            concepts=concepts, concept_vec=cvec, concept_pe=cpe,
            spec=ConceptAttentionSpec(backend="xla"),
        )
        got = double_block(
            p, img, txt, vec, pe, cfg.num_heads,
            concepts=concepts, concept_vec=cvec, concept_pe=cpe,
            spec=ConceptAttentionSpec(backend="pallas_interpret", int8_qk=True),
        )
        for i, name in [(0, "img"), (1, "txt"), (2, "concepts")]:
            np.testing.assert_allclose(
                np.asarray(exact[i]), np.asarray(got[i]),
                rtol=0.1, atol=0.02, err_msg=name,
            )

    def test_single_block_receives_int8_qk(self):
        """spec.int8_qk must reach the SINGLE blocks too (regression: it was
        once plumbed only into the 19 double blocks while the 38 single
        blocks — ~2/3 of attention FLOPs at the headline shape — silently
        stayed bf16)."""
        from conceptattention_tpu.config import configs
        from conceptattention_tpu.models.flux.blocks import single_block
        from conceptattention_tpu.models.flux.params import _single_block
        from conceptattention_tpu.ops.rope import embed_nd as _embed

        cfg = configs["flux-tiny"].params
        key = jax.random.PRNGKey(11)
        ks = jax.random.split(key, 3)
        p = _single_block(ks[0], cfg, jnp.float32)
        L = 128
        x = jax.random.normal(ks[1], (1, L, cfg.hidden_size), jnp.float32)
        vec = jax.random.normal(ks[2], (1, cfg.hidden_size), jnp.float32)
        ids = jnp.zeros((1, L, 3), jnp.float32).at[:, :, 1].set(
            jnp.arange(L, dtype=jnp.float32)[None]
        )
        pe = _embed(ids, cfg.axes_dim, cfg.theta)

        exact = single_block(p, x, vec, pe, cfg.num_heads, cfg.mlp_hidden_dim)
        i8 = single_block(
            p, x, vec, pe, cfg.num_heads, cfg.mlp_hidden_dim,
            backend="pallas_interpret", int8_qk=True,
        )
        # close to exact (quantized scores) but NOT identical — identical
        # would mean the flag silently fell off the path again
        np.testing.assert_allclose(
            np.asarray(exact), np.asarray(i8), rtol=0.1, atol=0.05
        )
        assert float(jnp.abs(exact - i8).max()) > 0

    def test_int8_qk_rejects_non_pallas_backends(self):
        """int8_qk on a non-Pallas backend raises instead of silently
        running bf16 (covers the spec consumer, the single block, and the
        public pipeline constructor)."""
        import pytest

        from conceptattention_tpu import ConceptAttentionFluxPipeline
        from conceptattention_tpu.config import configs
        from conceptattention_tpu.models.flux.blocks import single_block
        from conceptattention_tpu.models.flux.params import _single_block
        from conceptattention_tpu.ops.attention import joint_concept_attention

        key = jax.random.PRNGKey(3)
        ks = jax.random.split(key, 6)
        txt_qkv = tuple(jax.random.normal(k, (1, H, T, D)) for k in ks[:3])
        img_qkv = tuple(jax.random.normal(k, (1, H, P, D)) for k in ks[3:])
        ids = jnp.concatenate(
            [jnp.zeros((1, T, 3)), make_img_ids(6, 8)], axis=1
        )
        pe = embed_nd(ids, AXES, 10_000)
        with pytest.raises(ValueError, match="int8_qk"):
            joint_concept_attention(
                txt_qkv, img_qkv, None, pe, None,
                spec=ConceptAttentionSpec(backend="xla", int8_qk=True),
            )

        cfg = configs["flux-tiny"].params
        p = _single_block(ks[0], cfg, jnp.float32)
        x = jax.random.normal(ks[1], (1, 64, cfg.hidden_size), jnp.float32)
        vec = jax.random.normal(ks[2], (1, cfg.hidden_size), jnp.float32)
        sids = jnp.zeros((1, 64, 3), jnp.float32)
        from conceptattention_tpu.ops.rope import embed_nd as _embed

        spe = _embed(sids, cfg.axes_dim, cfg.theta)
        with pytest.raises(ValueError, match="int8_qk"):
            single_block(
                p, x, vec, spe, cfg.num_heads, cfg.mlp_hidden_dim,
                backend="xla", int8_qk=True,
            )

        with pytest.raises(ValueError, match="int8_qk"):
            ConceptAttentionFluxPipeline(
                model_name="flux-tiny", dtype=jnp.float32,
                attention_backend="xla", int8_qk=True,
            )


class TestPerSampleRopeIds:
    def test_batched_rope_tables_handle_per_sample_ids(self):
        """Per-sample position ids (e.g. crops / mixed resolutions in one
        batch) must rope correctly — the kernel's tables are per batch row,
        not assumed batch-invariant."""
        key = jax.random.PRNGKey(7)
        b = 2
        ks = jax.random.split(key, 6)
        txt_qkv = tuple(jax.random.normal(k, (b, H, T, D)) for k in ks[:3])
        img_qkv = tuple(jax.random.normal(k, (b, H, P, D)) for k in ks[3:])
        # batch row 0: the native grid; batch row 1: a shifted crop
        ids0 = make_img_ids(6, 8)
        ids1 = make_img_ids(6, 8) + jnp.asarray([0.0, 5.0, 9.0])
        img_ids = jnp.concatenate([ids0, ids1], axis=0)
        txt_ids = jnp.zeros((b, T, 3))
        pe = embed_nd(jnp.concatenate([txt_ids, img_ids], 1), AXES, 10_000)

        spec_x = ConceptAttentionSpec(backend="xla")
        spec_p = ConceptAttentionSpec(
            backend="pallas_interpret", block_q=BQ, block_k=BK
        )
        txt_x, img_x, _, _ = joint_concept_attention(
            txt_qkv, img_qkv, None, pe, None, spec_x
        )
        txt_p, img_p, _, _ = joint_concept_attention(
            txt_qkv, img_qkv, None, pe, None, spec_p
        )
        np.testing.assert_allclose(
            np.asarray(img_p), np.asarray(img_x), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(txt_p), np.asarray(txt_x), rtol=2e-4, atol=2e-5
        )
        # and the two batch rows genuinely differ (the ids did)
        assert np.abs(np.asarray(img_p[0]) - np.asarray(img_p[1])).max() > 1e-3
