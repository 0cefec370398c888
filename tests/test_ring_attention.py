"""Ring attention vs dense attention on the virtual seq-sharded mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from conceptattention_tpu.ops.attention import sdpa
from conceptattention_tpu.parallel.mesh import make_mesh
from conceptattention_tpu.parallel.ring_attention import make_ring_attention


def test_ring_attention_matches_dense():
    mesh = make_mesh(data=1, seq=4, model=1)
    b, h, l, d = 1, 2, 64, 16
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, l, d))
    k = jax.random.normal(keys[1], (b, h, l, d))
    v = jax.random.normal(keys[2], (b, h, l, d))

    want = sdpa(q, k, v)

    ring = make_ring_attention(mesh, "seq")
    sharding = NamedSharding(mesh, P(None, None, "seq", None))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))
    got = jax.jit(ring)(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_ring_attention_grad_flows():
    mesh = make_mesh(data=1, seq=2, model=1)
    b, h, l, d = 1, 1, 16, 8
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(keys[0], (b, h, l, d))
    k = jax.random.normal(keys[1], (b, h, l, d))
    v = jax.random.normal(keys[2], (b, h, l, d))
    ring = make_ring_attention(mesh, "seq")

    def loss(q):
        return jnp.sum(ring(q, k, v) ** 2)

    g = jax.jit(jax.grad(loss))(q)
    assert np.isfinite(np.asarray(g)).all()
