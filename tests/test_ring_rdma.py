"""Pallas-RDMA ring attention (kernels/ring_rdma.py) vs dense and vs the
ppermute ring formulation, on the virtual CPU mesh via the TPU interpret
machine's remote-DMA emulation.

No reference counterpart (manuragkhullar/ConceptAttention is single-GPU dense
SDPA, SURVEY.md §5); the correctness oracles are ops/attention.sdpa and
parallel/ring_attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from conceptattention_tpu.kernels.ring_rdma import (
    make_ring_attention_rdma,
    make_ring_concept_attention_rdma,
)
from conceptattention_tpu.ops.attention import sdpa
from conceptattention_tpu.parallel.ring_attention import (
    make_ring_concept_attention,
)


def _mesh(n, name="seq"):
    return Mesh(np.array(jax.devices()[:n]), (name,))


def _qkv(key, b, h, l, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    mk = lambda k: jax.random.normal(k, (b, h, l, d), dtype)
    return mk(kq), mk(kk), mk(kv)


class TestRingRdma:
    def test_matches_dense_sdpa(self):
        q, k, v = _qkv(jax.random.PRNGKey(0), 1, 2, 32, 16)
        mesh = _mesh(4)
        fn = jax.jit(make_ring_attention_rdma(mesh, "seq", interpret=True))
        out = fn(q, k, v)
        ref = sdpa(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_single_device_ring(self):
        q, k, v = _qkv(jax.random.PRNGKey(1), 1, 1, 16, 8)
        mesh = _mesh(1)
        fn = jax.jit(make_ring_attention_rdma(mesh, "seq", interpret=True))
        out = fn(q, k, v)
        ref = sdpa(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_bf16_inputs(self):
        q, k, v = _qkv(jax.random.PRNGKey(2), 1, 2, 32, 16, jnp.bfloat16)
        mesh = _mesh(4)
        fn = jax.jit(make_ring_attention_rdma(mesh, "seq", interpret=True))
        out = fn(q, k, v)
        ref = sdpa(q.astype(jnp.float32), k.astype(jnp.float32),
                   v.astype(jnp.float32))
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=2e-2
        )

    def test_masked_matches_ppermute_ring_and_padding_zero(self):
        # Fused [txt | img | concept | pad] sequence: 6+18+3 = 27, pad to 32.
        t_len, p_len, c_len = 6, 18, 3
        s = 32
        q, k, v = _qkv(jax.random.PRNGKey(3), 1, 2, s, 16)
        mesh = _mesh(4)
        kw = dict(txt_len=t_len, img_len=p_len, concept_len=c_len,
                  cross=True, self_attention=True)
        rdma = jax.jit(make_ring_concept_attention_rdma(
            mesh, "seq", interpret=True, **kw))
        ppermute = jax.jit(make_ring_concept_attention(mesh, "seq", **kw))
        out = np.asarray(rdma(q, k, v))
        ref = np.asarray(ppermute(q, k, v))
        np.testing.assert_allclose(out, ref, atol=2e-5)
        # padded rows are exactly zero
        np.testing.assert_array_equal(out[:, :, t_len + p_len + c_len :], 0.0)

    @pytest.mark.parametrize("cross,self_attn", [(True, False), (False, True)])
    def test_masked_ablations(self, cross, self_attn):
        t_len, p_len, c_len = 4, 20, 8
        q, k, v = _qkv(jax.random.PRNGKey(4), 1, 1, 32, 8)
        mesh = _mesh(4)
        kw = dict(txt_len=t_len, img_len=p_len, concept_len=c_len,
                  cross=cross, self_attention=self_attn)
        rdma = jax.jit(make_ring_concept_attention_rdma(
            mesh, "seq", interpret=True, **kw))
        ppermute = jax.jit(make_ring_concept_attention(mesh, "seq", **kw))
        np.testing.assert_allclose(
            np.asarray(rdma(q, k, v)), np.asarray(ppermute(q, k, v)), atol=2e-5
        )

    def test_ring_size_two(self):
        q, k, v = _qkv(jax.random.PRNGKey(5), 2, 1, 16, 8)
        mesh = _mesh(2)
        fn = jax.jit(make_ring_attention_rdma(mesh, "seq", interpret=True))
        np.testing.assert_allclose(
            np.asarray(fn(q, k, v)), np.asarray(sdpa(q, k, v)), atol=2e-5
        )

    def test_multi_axis_mesh(self):
        """Regression: dict-form MESH device ids — on a multi-axis mesh
        (make_mesh inserts size-1 data/pipe/expert/model axes around `seq`)
        the ring's neighbor addressing must target mesh coordinates, not
        seq-axis indices as LOGICAL ids."""
        from conceptattention_tpu.parallel.mesh import make_mesh

        q, k, v = _qkv(jax.random.PRNGKey(7), 1, 2, 32, 16)
        mesh = make_mesh(seq=4)
        fn = jax.jit(make_ring_attention_rdma(mesh, "seq", interpret=True))
        np.testing.assert_allclose(
            np.asarray(fn(q, k, v)), np.asarray(sdpa(q, k, v)), atol=2e-5
        )

    def test_dp_ring_composition(self):
        """Two independent seq=2 rings side by side on a (data=2, seq=2)
        mesh: each data slice's ring must stay within its slice (its hops
        default the `data` coordinate to the sender's own)."""
        from conceptattention_tpu.parallel.mesh import make_mesh

        q, k, v = _qkv(jax.random.PRNGKey(8), 2, 2, 16, 8)
        mesh = make_mesh(data=2, seq=2)
        fn = jax.jit(make_ring_attention_rdma(
            mesh, "seq", batch_axis="data", interpret=True))
        np.testing.assert_allclose(
            np.asarray(fn(q, k, v)), np.asarray(sdpa(q, k, v)), atol=2e-5
        )

    def test_tp_ring_composition(self):
        """Heads sharded over `model` alongside the seq ring (sp x tp): each
        (model slice)'s ring rotates only its own head shard."""
        from conceptattention_tpu.parallel.mesh import make_mesh

        q, k, v = _qkv(jax.random.PRNGKey(9), 1, 4, 16, 8)
        mesh = make_mesh(seq=2, model=2)
        fn = jax.jit(make_ring_attention_rdma(
            mesh, "seq", head_axis="model", interpret=True))
        np.testing.assert_allclose(
            np.asarray(fn(q, k, v)), np.asarray(sdpa(q, k, v)), atol=2e-5
        )

    def test_masked_tp_ring_composition(self):
        """The concept-masked variant with heads on `model` and the ring on
        `seq` equals the ppermute formulation under the same sharding."""
        from conceptattention_tpu.parallel.mesh import make_mesh

        t_len, p_len, c_len = 6, 18, 3
        q, k, v = _qkv(jax.random.PRNGKey(10), 1, 4, 32, 8)
        mesh = make_mesh(seq=2, model=2)
        kw = dict(txt_len=t_len, img_len=p_len, concept_len=c_len,
                  cross=True, self_attention=True, head_axis="model")
        rdma = jax.jit(make_ring_concept_attention_rdma(
            mesh, "seq", interpret=True, **kw))
        ppermute = jax.jit(make_ring_concept_attention(mesh, "seq", **kw))
        np.testing.assert_allclose(
            np.asarray(rdma(q, k, v)), np.asarray(ppermute(q, k, v)), atol=2e-5
        )


class TestRingRdmaBackend:
    def test_joint_concept_attention_backend(self):
        """ops/attention backend='ring_rdma_interpret' equals 'xla' end to
        end through the fused dual-pass contract."""
        from conceptattention_tpu.ops.attention import (
            ConceptAttentionSpec, joint_concept_attention,
        )

        key = jax.random.PRNGKey(6)
        b, h, d = 1, 2, 16
        t_len, p_len, c_len = 4, 16, 4
        ks = jax.random.split(key, 9)
        mk = lambda k, l: jax.random.normal(k, (b, h, l, d), jnp.float32)
        txt_qkv = tuple(mk(ks[i], t_len) for i in range(3))
        img_qkv = tuple(mk(ks[3 + i], p_len) for i in range(3))
        con_qkv = tuple(mk(ks[6 + i], c_len) for i in range(3))
        # identity rope tables (cos=1, sin=0) broadcasting to [B,H,L,D/2]
        cos = jnp.ones((1, 1, t_len + p_len, d // 2), jnp.float32)
        sin = jnp.zeros_like(cos)
        ccos = jnp.ones((1, 1, c_len + p_len, d // 2), jnp.float32)
        csin = jnp.zeros_like(ccos)

        ref = joint_concept_attention(
            txt_qkv, img_qkv, con_qkv, (cos, sin), (ccos, csin),
            ConceptAttentionSpec(backend="xla"),
        )
        mesh = _mesh(4)
        out = joint_concept_attention(
            txt_qkv, img_qkv, con_qkv, (cos, sin), (ccos, csin),
            ConceptAttentionSpec(backend="ring_rdma_interpret", mesh=mesh),
        )
        for a, b_ in zip(ref[:3], out[:3]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-5
            )
