"""JAX T5 encoder vs HuggingFace torch T5EncoderModel (random tiny config)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from conceptattention_tpu.models.text.t5 import (
    T5Config,
    convert_t5_state_dict,
    relative_position_bucket,
    t5_encode,
)

TINY = T5Config(
    vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_heads=4, num_layers=2,
    relative_attention_num_buckets=8, relative_attention_max_distance=16,
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=TINY.vocab_size, d_model=TINY.d_model, d_kv=TINY.d_kv,
        d_ff=TINY.d_ff, num_layers=TINY.num_layers, num_heads=TINY.num_heads,
        relative_attention_num_buckets=TINY.relative_attention_num_buckets,
        relative_attention_max_distance=TINY.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
    )
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg).eval()
    params = convert_t5_state_dict(model.state_dict(), TINY, dtype=jnp.float32)
    return model, params


def test_bucket_function_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention

    rel = torch.arange(-20, 21)[None, :] - torch.zeros(1, dtype=torch.long)[:, None]
    want = T5Attention._relative_position_bucket(
        rel, bidirectional=True, num_buckets=8, max_distance=16
    ).numpy()
    got = np.asarray(
        relative_position_bucket(jnp.asarray(rel.numpy()), 8, 16)
    )
    np.testing.assert_array_equal(got, want)


def test_t5_encoder_matches_hf(hf_pair):
    model, params = hf_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY.vocab_size, size=(2, 9))
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    got = np.asarray(t5_encode(params, TINY, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_t5_attention_mask(hf_pair):
    model, params = hf_pair
    rng = np.random.default_rng(1)
    ids = rng.integers(0, TINY.vocab_size, size=(1, 6))
    mask = np.array([[1, 1, 1, 1, 0, 0]])
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(t5_encode(params, TINY, jnp.asarray(ids), jnp.asarray(mask)))
    # unmasked positions must match
    np.testing.assert_allclose(got[:, :4], want[:, :4], rtol=2e-3, atol=2e-4)
