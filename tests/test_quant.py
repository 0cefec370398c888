"""Weight-only int8 quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from conceptattention_tpu.config import configs
from conceptattention_tpu.models.flux.dit import flux_forward
from conceptattention_tpu.models.flux.params import init_flux_params
from conceptattention_tpu.ops.packing import make_img_ids
from conceptattention_tpu.ops.quant import (
    dequantize_array,
    dequantize_tree,
    quantize_array,
    quantize_flux_params,
)

CFG = configs["flux-tiny"].params


def test_quantize_roundtrip_error_bounded():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.5
    # fp32 scales: strict absmax bound (error <= scale/2 per element)
    qd = quantize_array(w, compute_dtype=jnp.float32)
    assert qd["q"].dtype == jnp.int8
    w2 = dequantize_array(qd)
    scale = np.asarray(qd["scale"], np.float32)
    err = np.abs(np.asarray(w2, np.float32) - np.asarray(w))
    assert (err <= scale / 2 + 1e-6).all()
    # bf16 scales (production): bound loosens by bf16 rounding of the product
    qd16 = quantize_array(w)
    w216 = dequantize_array(qd16)
    err16 = np.abs(np.asarray(w216, np.float32) - np.asarray(w))
    assert (err16 <= np.asarray(qd16["scale"], np.float32) * 1.0 + 1e-6).all()


def test_dequantize_tree_identity_on_plain():
    tree = {"a": {"w": jnp.ones((2, 2)), "b": jnp.zeros(2)}}
    out = dequantize_tree(tree)
    np.testing.assert_array_equal(np.asarray(out["a"]["w"]), np.asarray(tree["a"]["w"]))


def test_quantized_forward_close_to_fp():
    key = jax.random.PRNGKey(1)
    keys = jax.random.split(key, 5)
    params = init_flux_params(keys[0], CFG, jnp.float32)
    qparams = quantize_flux_params(params)
    # the big stacks are int8 now
    assert qparams["double"]["img_qkv"]["w"]["q"].dtype == jnp.int8

    img = jax.random.normal(keys[1], (1, 16, CFG.in_channels))
    txt = jax.random.normal(keys[2], (1, 4, CFG.context_in_dim))
    y = jax.random.normal(keys[3], (1, CFG.vec_in_dim))
    common = dict(
        img=img, img_ids=make_img_ids(4, 4), txt=txt,
        txt_ids=jnp.zeros((1, 4, 3)), timesteps=jnp.asarray([0.5]), y=y,
    )
    pred_fp, _ = flux_forward(params, CFG, **common)
    pred_q, _ = flux_forward(qparams, CFG, **common)
    # int8 weight-only: outputs close in relative terms
    denom = np.abs(np.asarray(pred_fp)).mean()
    err = np.abs(np.asarray(pred_q) - np.asarray(pred_fp)).mean()
    assert err / denom < 0.1, (err, denom)


def test_quantized_param_bytes_halved():
    params = init_flux_params(jax.random.PRNGKey(2), CFG, jnp.bfloat16)
    qparams = quantize_flux_params(params)

    def nbytes(t):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(t))

    assert nbytes(qparams) < 0.65 * nbytes(params)
