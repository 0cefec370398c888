"""JAX CLIP text encoder vs HuggingFace torch CLIPTextModel (tiny config)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from conceptattention_tpu.models.text.clip import (
    CLIPTextConfig,
    clip_text_encode,
    convert_clip_text_state_dict,
)

TINY = CLIPTextConfig(
    vocab_size=100, hidden_size=32, num_heads=4, num_layers=2,
    max_position_embeddings=16, eos_token_id=99,
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel

    hf_cfg = HFCfg(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        intermediate_size=4 * TINY.hidden_size,
        num_attention_heads=TINY.num_heads, num_hidden_layers=TINY.num_layers,
        max_position_embeddings=TINY.max_position_embeddings,
        eos_token_id=TINY.eos_token_id, bos_token_id=98,
        hidden_act="quick_gelu", attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = CLIPTextModel(hf_cfg).eval()
    params = convert_clip_text_state_dict(model.state_dict(), TINY, dtype=jnp.float32)
    return model, params


def test_clip_text_matches_hf(hf_pair):
    model, params = hf_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 98, size=(2, 10))
    ids[:, -1] = TINY.eos_token_id
    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids))
    got = clip_text_encode(params, TINY, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]), out.last_hidden_state.numpy(),
        rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["pooler_output"]), out.pooler_output.numpy(),
        rtol=2e-3, atol=2e-4,
    )


def test_eos_pooling_position(hf_pair):
    _, params = hf_pair
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 98, size=(1, 8))
    ids[0, 5] = TINY.eos_token_id  # EOS mid-sequence
    got = clip_text_encode(params, TINY, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(got["pooler_output"][0]),
        np.asarray(got["last_hidden_state"][0, 5]),
        rtol=1e-6,
    )
