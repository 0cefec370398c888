"""Expert parallelism (parallel/moe.py): the all_to_all-dispatched MoE over
the `expert` mesh axis must equal the single-device dense reference when
capacity admits every routed token."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conceptattention_tpu.parallel.mesh import AXES, make_mesh
from conceptattention_tpu.parallel.moe import (
    init_moe_params,
    moe_mlp,
    moe_mlp_expert_parallel,
)


class TestMoE:
    def test_dense_shapes_and_gate_normalization(self):
        d, e, n = 16, 8, 32
        params = init_moe_params(jax.random.PRNGKey(0), d, 32, e)
        x = jax.random.normal(jax.random.PRNGKey(1), (n, d))
        out, aux = moe_mlp(params, x, top_k=2, capacity=n)
        assert out.shape == (n, d)
        assert np.isfinite(np.asarray(out)).all()
        assert float(aux) > 0.0

    def test_top1_is_single_expert_output(self):
        """top_k=1 with full capacity: each token's output equals its argmax
        expert's MLP applied alone (gate renormalizes to 1)."""
        d, e, n = 8, 4, 16
        params = init_moe_params(jax.random.PRNGKey(2), d, 16, e)
        x = jax.random.normal(jax.random.PRNGKey(3), (n, d))
        out, _ = moe_mlp(params, x, top_k=1, capacity=n)
        gates = jax.nn.softmax((x @ params["router"]).astype(jnp.float32), -1)
        pick = jnp.argmax(gates, axis=-1)
        want = jnp.stack([
            jax.nn.gelu(x[i] @ params["w_in"][pick[i]], approximate=True)
            @ params["w_out"][pick[i]]
            for i in range(n)
        ])
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5)

    def test_capacity_drops_tokens(self):
        """capacity=0 must produce exact zeros (everything dropped)."""
        d, e, n = 8, 4, 8
        params = init_moe_params(jax.random.PRNGKey(4), d, 16, e)
        x = jax.random.normal(jax.random.PRNGKey(5), (n, d))
        out, _ = moe_mlp(params, x, top_k=2, capacity=0)
        # capacity floor in _route is the passed value; 0 keeps nothing
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    @pytest.mark.parametrize("top_k", [1, 2])
    def test_expert_parallel_matches_dense(self, top_k):
        d, e, n, ep = 16, 8, 32, 4
        params = init_moe_params(jax.random.PRNGKey(6), d, 32, e)
        x = jax.random.normal(jax.random.PRNGKey(7), (n, d))
        # No-drop capacity on both sides -> exact equality. The ep bound is
        # seed-INDEPENDENT: each token claims an expert at most once (top_k
        # distinct experts), so per-shard claims on any expert <= n_local =
        # n/ep <= top_k*n/ep = capacity.
        want, want_aux = moe_mlp(params, x, top_k=top_k, capacity=n)
        mesh = make_mesh(expert=ep, model=2)
        got, aux = jax.jit(
            lambda p, x: moe_mlp_expert_parallel(
                p, x, mesh, axis=AXES.expert, top_k=top_k,
                capacity=top_k * n // ep,
            )
        )(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
        # The aux loss aggregates frac/gate-mean globally before the product,
        # so it matches the dense Switch loss exactly too.
        np.testing.assert_allclose(float(aux), float(want_aux), rtol=1e-5)

    def test_expert_parallel_gradients_flow(self):
        """Backprop through router + both all_to_alls (transpose is the
        reverse all_to_all) produces finite, nonzero expert grads."""
        d, e, n, ep = 8, 4, 16, 4
        params = init_moe_params(jax.random.PRNGKey(8), d, 16, e)
        x = jax.random.normal(jax.random.PRNGKey(9), (n, d))
        mesh = make_mesh(expert=ep)

        def loss(p):
            out, aux = moe_mlp_expert_parallel(
                p, x, mesh, top_k=2, capacity=2 * n // ep
            )
            return jnp.sum(out**2) + 0.01 * aux

        g = jax.jit(jax.grad(loss))(params)
        for leaf in jax.tree.leaves(g):
            arr = np.asarray(leaf)
            assert np.isfinite(arr).all()
        assert float(jnp.sum(jnp.abs(g["w_in"]))) > 0.0
        assert float(jnp.sum(jnp.abs(g["router"]))) > 0.0

    def test_rejects_bad_divisibility(self):
        params = init_moe_params(jax.random.PRNGKey(0), 8, 16, 6)  # 6 % 4 != 0
        mesh = make_mesh(expert=4)
        with pytest.raises(ValueError, match="experts not divisible"):
            moe_mlp_expert_parallel(params, jnp.zeros((8, 8)), mesh)
