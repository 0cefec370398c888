"""Numerics-substrate unit tests: RoPE, norms, embeddings, schedule, packing,
sparse normalizers. Torch oracles are written from the published math (not
copied from the reference); golden values pin the behavior.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from conceptattention_tpu.ops import (
    apply_rope,
    embed_nd,
    entmax15,
    get_schedule,
    layer_norm,
    make_img_ids,
    mlp_embedder,
    modulation,
    pack_latents,
    rms_norm,
    rope_table,
    sparsemax,
    timestep_embedding,
    unpack_latents,
)
from conceptattention_tpu.ops.attention import merge_heads, sdpa, split_qkv


def torch_rope_rotate(x, pos, dim, theta):
    """Independent torch oracle for interleaved-pair RoPE rotation."""
    scale = torch.arange(0, dim, 2, dtype=torch.float64) / dim
    omega = 1.0 / (theta**scale)
    args = torch.einsum("...n,d->...nd", pos.double(), omega)  # [..., n, dim/2]
    cos, sin = torch.cos(args).float(), torch.sin(args).float()
    xf = x.float().reshape(*x.shape[:-1], -1, 2)
    out0 = cos * xf[..., 0] - sin * xf[..., 1]
    out1 = sin * xf[..., 0] + cos * xf[..., 1]
    return torch.stack([out0, out1], dim=-1).reshape(x.shape)


class TestRope:
    def test_rope_table_identity_at_zero(self):
        cos, sin = rope_table(jnp.zeros((1, 4)), 16, 10_000)
        np.testing.assert_allclose(np.asarray(cos), 1.0)
        np.testing.assert_allclose(np.asarray(sin), 0.0)

    def test_apply_rope_matches_torch_oracle(self):
        b, h, n, d = 2, 3, 5, 16
        rng = np.random.default_rng(0)
        q = rng.standard_normal((b, h, n, d)).astype(np.float32)
        k = rng.standard_normal((b, h, n, d)).astype(np.float32)
        pos = rng.integers(0, 64, size=(b, n)).astype(np.float32)

        cos, sin = rope_table(jnp.asarray(pos), d, 10_000)
        pe = (cos[:, None], sin[:, None])  # broadcast over heads
        q_out, k_out = apply_rope(jnp.asarray(q), jnp.asarray(k), pe)

        q_ref = torch_rope_rotate(torch.from_numpy(q), torch.from_numpy(pos)[:, None, :], d, 10_000)
        k_ref = torch_rope_rotate(torch.from_numpy(k), torch.from_numpy(pos)[:, None, :], d, 10_000)
        np.testing.assert_allclose(np.asarray(q_out), q_ref.numpy(), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(k_out), k_ref.numpy(), rtol=2e-5, atol=2e-5)

    def test_embed_nd_shape_and_axes(self):
        ids = make_img_ids(4, 4, batch_size=2)  # [2, 16, 3]
        cos, sin = embed_nd(ids, (8, 12, 12), 10_000)
        assert cos.shape == (2, 1, 16, 16)  # head_dim 32 -> 16 pairs
        assert sin.shape == (2, 1, 16, 16)
        # axis 0 ids are all zero -> first 4 pair-channels are identity
        np.testing.assert_allclose(np.asarray(cos[..., :4]), 1.0)
        np.testing.assert_allclose(np.asarray(sin[..., :4]), 0.0)

    def test_rope_preserves_norm(self):
        q = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 32))
        ids = make_img_ids(2, 4)
        pe = embed_nd(ids, (8, 12, 12), 10_000)
        q_out, _ = apply_rope(q, q, pe)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(q_out), axis=-1),
            np.linalg.norm(np.asarray(q), axis=-1),
            rtol=1e-5,
        )


class TestNorms:
    def test_rms_norm_matches_torch(self):
        x = np.random.default_rng(1).standard_normal((2, 5, 8)).astype(np.float32)
        scale = np.random.default_rng(2).standard_normal(8).astype(np.float32)
        got = rms_norm(jnp.asarray(x), jnp.asarray(scale))
        xt = torch.from_numpy(x)
        rrms = torch.rsqrt(torch.mean(xt**2, dim=-1, keepdim=True) + 1e-6)
        want = (xt * rrms) * torch.from_numpy(scale)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-6)

    def test_layer_norm_matches_torch(self):
        x = np.random.default_rng(3).standard_normal((2, 5, 8)).astype(np.float32)
        got = layer_norm(jnp.asarray(x))
        want = torch.nn.functional.layer_norm(torch.from_numpy(x), (8,), eps=1e-6)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5)

    def test_modulation_chunks(self):
        d = 8
        rng = np.random.default_rng(4)
        vec = rng.standard_normal((2, d)).astype(np.float32)
        w = rng.standard_normal((d, 6 * d)).astype(np.float32)
        b = rng.standard_normal(6 * d).astype(np.float32)
        m1, m2 = modulation(jnp.asarray(vec), jnp.asarray(w), jnp.asarray(b), double=True)
        out = torch.nn.functional.silu(torch.from_numpy(vec)) @ torch.from_numpy(w) + torch.from_numpy(b)
        chunks = out[:, None, :].chunk(6, dim=-1)
        np.testing.assert_allclose(np.asarray(m1.shift), chunks[0].numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m1.scale), chunks[1].numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m2.gate), chunks[5].numpy(), rtol=1e-5, atol=1e-5)
        m1_only, m2_none = modulation(jnp.asarray(vec), jnp.asarray(w[:, : 3 * d]), jnp.asarray(b[: 3 * d]), double=False)
        assert m2_none is None
        assert m1_only.shift.shape == (2, 1, d)


class TestEmbeddings:
    def test_timestep_embedding_matches_reference_formula(self):
        t = jnp.asarray([0.0, 0.25, 1.0])
        dim = 16
        emb = timestep_embedding(t, dim)
        tt = 1000.0 * np.asarray(t)
        half = dim // 2
        freqs = np.exp(-math.log(10_000) * np.arange(half, dtype=np.float32) / half)
        args = tt[:, None] * freqs[None]
        want = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
        # Absolute tolerance: cos/sin of args up to 1000 in float32 — a 1e-7
        # relative frequency difference moves the angle by ~1e-4.
        np.testing.assert_allclose(np.asarray(emb), want, rtol=0, atol=2e-3)
        assert emb.shape == (3, dim)

    def test_mlp_embedder(self):
        p = {
            "in": {"w": jnp.ones((4, 8)) * 0.1, "b": jnp.zeros(8)},
            "out": {"w": jnp.eye(8), "b": jnp.zeros(8)},
        }
        x = jnp.ones((2, 4))
        out = mlp_embedder(x, p)
        want = jax.nn.silu(jnp.full((2, 8), 0.4))
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)


class TestSchedule:
    def test_unshifted_is_linspace(self):
        ts = get_schedule(4, 4096, shift=False)
        np.testing.assert_allclose(ts, [1.0, 0.75, 0.5, 0.25, 0.0])

    def test_shifted_monotone_and_endpoints(self):
        ts = get_schedule(50, 4096, shift=True)
        assert len(ts) == 51
        assert ts[0] == pytest.approx(1.0)
        assert ts[-1] == pytest.approx(0.0)
        assert all(a > b for a, b in zip(ts[:-1], ts[1:]))
        # mu at seq_len 4096 is max_shift=1.15; check midpoint value
        mu = 1.15
        t = 0.5
        want = math.exp(mu) / (math.exp(mu) + (1 / t - 1))
        assert ts[25] == pytest.approx(want, rel=1e-6)


class TestPacking:
    def test_pack_unpack_roundtrip(self):
        x = jnp.arange(2 * 16 * 8 * 8, dtype=jnp.float32).reshape(2, 16, 8, 8)
        packed = pack_latents(x)
        assert packed.shape == (2, 16, 64)
        unpacked = unpack_latents(packed, 4, 4)  # token grid = latent dims / 2
        np.testing.assert_array_equal(np.asarray(unpacked), np.asarray(x))

    def test_pack_matches_einops_reference_order(self):
        import einops

        x = np.random.default_rng(5).standard_normal((1, 4, 4, 6)).astype(np.float32)
        want = einops.rearrange(x, "b c (h ph) (w pw) -> b (h w) (c ph pw)", ph=2, pw=2)
        got = pack_latents(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    def test_img_ids_layout(self):
        ids = np.asarray(make_img_ids(2, 3))
        assert ids.shape == (1, 6, 3)
        np.testing.assert_array_equal(ids[0, :, 0], 0)
        np.testing.assert_array_equal(ids[0, :, 1], [0, 0, 0, 1, 1, 1])
        np.testing.assert_array_equal(ids[0, :, 2], [0, 1, 2, 0, 1, 2])


class TestSparse:
    def test_sparsemax_simplex(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 7, 5))
        p = sparsemax(x, axis=1)
        p_np = np.asarray(p)
        assert (p_np >= 0).all()
        np.testing.assert_allclose(p_np.sum(axis=1), 1.0, rtol=1e-5)

    def test_sparsemax_known_values(self):
        # For z = [1, 0.5, 0]: support {1, 2}, tau = 0.25 -> p = [0.75, 0.25, 0]
        p = sparsemax(jnp.asarray([[1.0, 0.5, 0.0]]), axis=-1)
        np.testing.assert_allclose(np.asarray(p), [[0.75, 0.25, 0.0]], atol=1e-6)

    def test_sparsemax_is_sparse_softmax_is_not(self):
        z = jnp.asarray([[3.0, 0.0, -1.0, -2.0]])
        p = np.asarray(sparsemax(z, axis=-1))
        assert (p == 0).sum() >= 2

    def test_entmax15_simplex_and_sparsity(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (6, 9)) * 3
        p = np.asarray(entmax15(x, axis=-1))
        assert (p >= 0).all()
        np.testing.assert_allclose(p.sum(axis=-1), 1.0, rtol=1e-4)
        assert (p == 0).any()  # should produce some sparsity at scale 3

    def test_entmax15_uniform_input(self):
        p = np.asarray(entmax15(jnp.zeros((1, 5)), axis=-1))
        np.testing.assert_allclose(p, 0.2, atol=1e-6)

    def test_entmax15_between_softmax_and_sparsemax(self):
        z = jnp.asarray([[2.0, 1.0, 0.0]])
        soft = np.asarray(jax.nn.softmax(z, axis=-1))
        ent = np.asarray(entmax15(z, axis=-1))
        sp = np.asarray(sparsemax(z, axis=-1))
        assert sp[0, 0] > ent[0, 0] > soft[0, 0]


class TestAttention:
    def test_sdpa_matches_torch(self):
        rng = np.random.default_rng(7)
        q = rng.standard_normal((2, 3, 5, 8)).astype(np.float32)
        k = rng.standard_normal((2, 3, 6, 8)).astype(np.float32)
        v = rng.standard_normal((2, 3, 6, 8)).astype(np.float32)
        got = sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        want = torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
        )
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)

    def test_split_qkv_matches_einops(self):
        import einops

        x = np.random.default_rng(8).standard_normal((2, 5, 3 * 4 * 8)).astype(np.float32)
        q, k, v = split_qkv(jnp.asarray(x), num_heads=4)
        want = einops.rearrange(x, "B L (K H D) -> K B H L D", K=3, H=4)
        np.testing.assert_allclose(np.asarray(q), want[0], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(v), want[2], rtol=1e-6)

    def test_merge_heads(self):
        import einops

        x = np.random.default_rng(9).standard_normal((2, 4, 5, 8)).astype(np.float32)
        got = merge_heads(jnp.asarray(x))
        want = einops.rearrange(x, "B H L D -> B L (H D)")
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
