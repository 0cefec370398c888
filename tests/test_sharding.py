"""Mesh-sharding tests on the virtual 8-device CPU mesh: param placement,
sharded forward equivalence, and the sharded training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from conceptattention_tpu.config import configs
from conceptattention_tpu.models.flux.dit import flux_forward
from conceptattention_tpu.models.flux.params import init_flux_params
from conceptattention_tpu.ops.packing import make_img_ids
from conceptattention_tpu.parallel.mesh import AXES, make_mesh
from conceptattention_tpu.parallel.sharding import (
    activation_sharding,
    flux_param_sharding,
    shard_params,
)
from conceptattention_tpu.training.train_step import init_train_state, make_train_step

CFG = configs["flux-tiny"].params
B, T, C = 2, 4, 3
GRID = (4, 4)
P_TOKENS = GRID[0] * GRID[1]


@pytest.fixture(scope="module")
def batch():
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 5)
    return dict(
        img=jax.random.normal(keys[0], (B, P_TOKENS, CFG.in_channels)),
        img_ids=make_img_ids(*GRID, batch_size=B),
        txt=jax.random.normal(keys[1], (B, T, CFG.context_in_dim)),
        txt_ids=jnp.zeros((B, T, 3)),
        y=jax.random.normal(keys[2], (B, CFG.vec_in_dim)),
    )


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_param_sharding_placement():
    mesh = make_mesh(data=2, model=4)
    params = init_flux_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    sharded = shard_params(params, mesh, CFG)
    # QKV head axis is split 4-ways on `model`
    qkv = sharded["double"]["img_qkv"]["w"]
    assert qkv.sharding.spec == P(None, None, None, AXES.model, None)
    # mlp_in output axis split on model
    assert sharded["double"]["img_mlp_in"]["w"].sharding.spec == P(None, None, AXES.model)
    # values preserved
    np.testing.assert_allclose(
        np.asarray(sharded["double"]["img_qkv"]["w"]),
        np.asarray(params["double"]["img_qkv"]["w"]),
    )


def test_sharded_forward_matches_single_device(batch):
    params = init_flux_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    pred_single, _ = flux_forward(
        params, CFG,
        img=batch["img"], img_ids=batch["img_ids"],
        txt=batch["txt"], txt_ids=batch["txt_ids"],
        timesteps=jnp.full((B,), 0.7), y=batch["y"],
    )

    mesh = make_mesh(data=2, model=4)
    sharded_params = shard_params(params, mesh, CFG)
    act = activation_sharding(mesh)

    @jax.jit
    def fwd(p, img, img_ids, txt, txt_ids, y):
        pred, _ = flux_forward(
            p, CFG, img=img, img_ids=img_ids, txt=txt, txt_ids=txt_ids,
            timesteps=jnp.full((img.shape[0],), 0.7), y=y,
        )
        return pred

    img = jax.device_put(batch["img"], act)
    pred_sharded = fwd(
        sharded_params, img, batch["img_ids"], batch["txt"], batch["txt_ids"], batch["y"]
    )
    np.testing.assert_allclose(
        np.asarray(pred_single), np.asarray(pred_sharded), rtol=5e-4, atol=5e-5
    )


def test_sharded_train_step_runs_and_reduces_loss(batch):
    mesh = make_mesh(data=2, model=4)
    params = init_flux_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    params = shard_params(params, mesh, CFG)
    tx, opt_state = init_train_state(params, learning_rate=1e-3)

    param_sharding = flux_param_sharding(mesh, CFG)
    batch_sharding = jax.tree.map(
        lambda _: NamedSharding(mesh, P(AXES.data)), batch
    )
    sharded_batch = jax.tree.map(jax.device_put, batch, batch_sharding)

    step = make_train_step(
        CFG, tx, mesh=mesh,
        param_sharding=param_sharding,
        batch_sharding=batch_sharding,
        donate=False,
    )
    key = jax.random.PRNGKey(42)
    params1, opt_state, loss0 = step(params, opt_state, sharded_batch, key)
    params2, opt_state, loss1 = step(params1, opt_state, sharded_batch, key)
    assert np.isfinite(float(loss0)) and np.isfinite(float(loss1))
    # Same batch + same key twice: the update must reduce that loss.
    assert float(loss1) < float(loss0)


@pytest.mark.parametrize("mode", ["w8", "w8a8", "w4"])
def test_quantized_params_shard_and_match(batch, mode):
    from conceptattention_tpu.ops.quant import quantize_flux_params

    params = init_flux_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    qparams = quantize_flux_params(params, mode=mode)
    pred_single, _ = flux_forward(
        qparams, CFG,
        img=batch["img"], img_ids=batch["img_ids"],
        txt=batch["txt"], txt_ids=batch["txt_ids"],
        timesteps=jnp.full((B,), 0.7), y=batch["y"],
    )
    mesh = make_mesh(data=2, model=4)
    sharded = shard_params(qparams, mesh, CFG)
    qk = {"w8": "q", "w8a8": "qa", "w4": "q4p"}[mode]
    assert sharded["double"]["img_qkv"]["w"][qk].sharding.spec == P(
        None, None, None, AXES.model, None
    )

    @jax.jit
    def fwd(p):
        pred, _ = flux_forward(
            p, CFG, img=batch["img"], img_ids=batch["img_ids"],
            txt=batch["txt"], txt_ids=batch["txt_ids"],
            timesteps=jnp.full((B,), 0.7), y=batch["y"],
        )
        return pred

    pred_sharded = fwd(sharded)
    np.testing.assert_allclose(
        np.asarray(pred_single), np.asarray(pred_sharded), rtol=5e-4, atol=5e-5
    )


def test_shard_params_guidance_model_without_cfg():
    """The cfg=None convenience form must not KeyError on flux-dev's
    guidance_in subtree — unknown keys replicate."""
    import dataclasses

    cfg = dataclasses.replace(CFG, guidance_embed=True)
    params = init_flux_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    mesh = make_mesh(data=2, model=4)
    sharded = shard_params(params, mesh)  # no cfg
    assert "guidance_in" in sharded
    leaf = jax.tree.leaves(sharded["guidance_in"])[0]
    assert leaf.sharding.is_fully_replicated
