"""conv3x3 Pallas kernel vs lax.conv_general_dilated (interpret mode on CPU).

The kernel backs the VAE decoder's hot conv path (autoencoder._conv2d_nhwc);
equality here is what licenses the routing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conceptattention_tpu.kernels.conv3x3 import (
    _pick_ht,
    conv3x3_same,
    use_conv3x3_kernel,
)


def _ref(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + b).astype(x.dtype)


@pytest.mark.parametrize(
    "b,h,w,cin,cout",
    [
        (1, 16, 16, 128, 128),   # decoder top level (shape class)
        (1, 8, 16, 256, 128),    # channel-reducing resblock
        (2, 8, 8, 128, 256),     # batch > 1, channel-expanding
        (1, 24, 8, 128, 128),    # h not a power of two (ht divisor walk)
    ],
)
def test_matches_lax_conv(b, h, w, cin, cout):
    key = jax.random.PRNGKey(0)
    kx, kw, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (b, h, w, cin), jnp.float32)
    wgt = jax.random.normal(kw, (3, 3, cin, cout), jnp.float32) * 0.05
    bias = jax.random.normal(kb, (cout,), jnp.float32)
    got = conv3x3_same(x, wgt, bias, interpret=True)
    want = _ref(x, wgt, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_matches_in_bf16():
    key = jax.random.PRNGKey(1)
    kx, kw, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (1, 16, 16, 128), jnp.bfloat16)
    wgt = jax.random.normal(kw, (3, 3, 128, 128), jnp.bfloat16) * 0.05
    bias = jax.random.normal(kb, (128,), jnp.bfloat16)
    got = np.asarray(conv3x3_same(x, wgt, bias, interpret=True), np.float32)
    want = np.asarray(_ref(x, wgt, bias), np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)


def test_border_zeros_exact():
    """SAME border correctness: a one-hot kernel tap that reads only the
    border must produce exact zeros at the edge."""
    x = jnp.ones((1, 8, 8, 128), jnp.float32)
    wgt = jnp.zeros((3, 3, 128, 128), jnp.float32)
    # tap (0, 0) copies the up-left neighbor of channel 0 into channel 0
    wgt = wgt.at[0, 0, 0, 0].set(1.0)
    got = np.asarray(conv3x3_same(x, wgt, jnp.zeros((128,)), interpret=True))
    assert got[0, 0, 0, 0] == 0.0  # up-left neighbor is the zero border
    assert got[0, 1, 1, 0] == 1.0


def test_fused_swish():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 8, 8, 128), jnp.float32)
    wgt = jax.random.normal(key, (3, 3, 128, 128), jnp.float32) * 0.05
    bias = jnp.zeros((128,))
    got = np.asarray(conv3x3_same(x, wgt, bias, fuse_swish=True, interpret=True))
    ref = np.asarray(_ref(x, wgt, bias), np.float32)
    np.testing.assert_allclose(got, ref / (1 + np.exp(-ref)), atol=2e-4, rtol=2e-4)


def test_gate_and_ht():
    assert not use_conv3x3_kernel((1, 16, 16, 96), 96, 128)   # cin not lane-aligned
    assert not use_conv3x3_kernel((1, 17, 16, 128), 128, 128) # h not tileable
    assert _pick_ht(1024, 1024, 128, 128) == 8
    assert _pick_ht(128, 128, 512, 512) * 128 >= 8192 or _pick_ht(128, 128, 512, 512) <= 128


def test_flash_kernel_at_vae_attention_shape():
    """The VAE mid-attention routes through the flash kernel at 1024^2
    (single head, d = C = 512, S = 16384); pin kernel == softmax(QK^T)V at
    that shape class (scaled down for interpret mode)."""
    from conceptattention_tpu.kernels.flash_saliency import (
        fused_concept_flash_attention,
    )

    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    s, d = 512, 256
    q = jax.random.normal(kq, (1, 1, s, d), jnp.float32)
    k = jax.random.normal(kk, (1, 1, s, d), jnp.float32)
    v = jax.random.normal(kv, (1, 1, s, d), jnp.float32)
    got = fused_concept_flash_attention(
        q, k, v, txt_len=s, img_len=0, concept_len=0,
        block_q=128, block_k=128, interpret=True,
    )
    logits = jnp.einsum("bhqc,bhkc->bhqk", q, k) / (d**0.5)
    want = jnp.einsum("bhqk,bhkc->bhqc", jax.nn.softmax(logits, axis=-1), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_decoder_routes_through_kernel_on_cpu_fallback():
    """On CPU the gate is False, so decode_nhwc stays on lax.conv — pin that
    the routing helper itself answers False here (tests run on CPU)."""
    assert jax.default_backend() == "cpu"
    assert not use_conv3x3_kernel((1, 1024, 1024, 128), 128, 128)
