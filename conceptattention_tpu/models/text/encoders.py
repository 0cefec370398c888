"""Text conditioning encoders: T5-XXL sequence embeddings + CLIP-L pooled vector.

Parity target: `HFEmbedder` (`flux/src/flux/modules/conditioner.py:6-38` in
manuragkhullar/ConceptAttention) — T5 last_hidden_state with max_length
padding, CLIP pooler_output — and `embed_concepts`
(`concept_attention/utils.py:6-33`): each concept embedded separately through
T5, first token kept, zero position ids, CLIP vector computed then zeroed.

Two implementations behind one protocol:
  - `HFTextEncoders`: HuggingFace T5/CLIP checkpoints run through their
    torch CPU forward once per prompt and cached; encoder outputs are small
    ([B, 256/512, 4096] and [B, 768]) so host->TPU transfer is negligible
    next to the DiT. Gated on local checkpoint availability (this environment
    has no network egress).
  - `StubTextEncoders`: deterministic hash-seeded embeddings at full model
    dims, for tests/benches without checkpoints. Distinct prompts map to
    distinct, reproducible vectors.
"""

from __future__ import annotations

import hashlib
from typing import List, Protocol, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TextEncoders(Protocol):
    t5_dim: int
    clip_dim: int
    t5_max_length: int

    def encode_t5(self, prompts: List[str]) -> jax.Array:
        """-> [B, t5_max_length, t5_dim]"""
        ...

    def encode_clip(self, prompts: List[str]) -> jax.Array:
        """-> [B, clip_dim]"""
        ...


class StubTextEncoders:
    """Deterministic, checkpoint-free text encoders for tests and benches."""

    def __init__(self, t5_dim: int = 4096, clip_dim: int = 768, t5_max_length: int = 256):
        self.t5_dim = t5_dim
        self.clip_dim = clip_dim
        self.t5_max_length = t5_max_length

    def _seed(self, text: str, salt: str) -> int:
        digest = hashlib.sha256((salt + "\x00" + text).encode()).digest()
        return int.from_bytes(digest[:4], "little")

    def encode_t5(self, prompts: List[str]) -> jax.Array:
        rows = []
        for p in prompts:
            rng = np.random.default_rng(self._seed(p, "t5"))
            rows.append(
                rng.standard_normal((self.t5_max_length, self.t5_dim)).astype(np.float32)
            )
        return jnp.asarray(np.stack(rows))

    def encode_clip(self, prompts: List[str]) -> jax.Array:
        rows = []
        for p in prompts:
            rng = np.random.default_rng(self._seed(p, "clip"))
            rows.append(rng.standard_normal(self.clip_dim).astype(np.float32))
        return jnp.asarray(np.stack(rows))


class HFTextEncoders:
    """HuggingFace-backed encoders (requires local checkpoints; no egress here).

    T5 runs with max_length padding and no attention-mask zeroing of padded
    positions in the output, matching the reference conditioner
    (conditioner.py:26-38).
    """

    def __init__(
        self,
        t5_name: str = "google/t5-v1_1-xxl",
        clip_name: str = "openai/clip-vit-large-patch14",
        t5_max_length: int = 256,
    ):
        import torch
        from transformers import AutoTokenizer, CLIPTextModel, T5EncoderModel

        self._torch = torch
        self.t5_tokenizer = AutoTokenizer.from_pretrained(t5_name, local_files_only=True)
        self.t5 = T5EncoderModel.from_pretrained(t5_name, local_files_only=True).eval()
        self.clip_tokenizer = AutoTokenizer.from_pretrained(clip_name, local_files_only=True)
        self.clip = CLIPTextModel.from_pretrained(clip_name, local_files_only=True).eval()
        self.t5_max_length = t5_max_length
        self.t5_dim = self.t5.config.d_model
        self.clip_dim = self.clip.config.hidden_size

    def encode_t5(self, prompts: List[str]) -> jax.Array:
        tok = self.t5_tokenizer(
            prompts, truncation=True, max_length=self.t5_max_length,
            padding="max_length", return_tensors="pt",
        )
        with self._torch.no_grad():
            out = self.t5(input_ids=tok.input_ids).last_hidden_state
        return jnp.asarray(out.float().numpy())

    def encode_clip(self, prompts: List[str]) -> jax.Array:
        tok = self.clip_tokenizer(
            prompts, truncation=True, max_length=77,
            padding="max_length", return_tensors="pt",
        )
        with self._torch.no_grad():
            out = self.clip(input_ids=tok.input_ids).pooler_output
        return jnp.asarray(out.float().numpy())


class JAXTextEncoders:
    """Fully on-TPU text conditioning: the JAX T5 encoder + CLIP text tower
    (models/text/t5.py, clip.py — HF-parity tested) with converted
    checkpoints. Tokenization stays on host (HF tokenizers); every matmul
    jits/shards with the rest of the pipeline."""

    def __init__(
        self,
        t5_params, t5_cfg, t5_tokenizer,
        clip_params, clip_cfg, clip_tokenizer,
        t5_max_length: int = 256,
        dtype=None,
    ):
        from conceptattention_tpu.models.text.clip import clip_text_encode
        from conceptattention_tpu.models.text.t5 import t5_encode

        self._t5_encode = jax.jit(
            lambda ids: t5_encode(t5_params, t5_cfg, ids)
        )
        self._clip_encode = jax.jit(
            lambda ids: clip_text_encode(clip_params, clip_cfg, ids)["pooler_output"]
        )
        self.t5_tokenizer = t5_tokenizer
        self.clip_tokenizer = clip_tokenizer
        self.t5_max_length = t5_max_length
        self.t5_dim = t5_cfg.d_model
        self.clip_dim = clip_cfg.hidden_size

    def encode_t5(self, prompts: List[str]) -> jax.Array:
        tok = self.t5_tokenizer(
            prompts, truncation=True, max_length=self.t5_max_length,
            padding="max_length", return_tensors="np",
        )
        return self._t5_encode(jnp.asarray(tok["input_ids"]))

    def encode_clip(self, prompts: List[str]) -> jax.Array:
        tok = self.clip_tokenizer(
            prompts, truncation=True, max_length=77,
            padding="max_length", return_tensors="np",
        )
        return self._clip_encode(jnp.asarray(tok["input_ids"]))


def embed_concepts(
    encoders: TextEncoders, concepts: List[str], batch_size: int = 1
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Concept token embeddings + ids + (zeroed) CLIP vector.

    Each concept is embedded separately through T5 and its *first token*
    embedding kept; concept ids are zeros (position-0 RoPE); the CLIP vector
    is zeroed (reference utils.py:6-33).

    Returns:
      (concept_embeddings [B, C, t5_dim], concept_ids [B, C, 3],
       concept_vec [B, clip_dim] — zeros).
    """
    tokens = []
    for concept in concepts:
        emb = encoders.encode_t5([concept])  # [1, L, D]
        tokens.append(emb[0, 0])
    concept_embeddings = jnp.stack(tokens)[None]  # [1, C, D]
    concept_embeddings = jnp.broadcast_to(
        concept_embeddings, (batch_size, len(concepts), concept_embeddings.shape[-1])
    )
    concept_ids = jnp.zeros((batch_size, len(concepts), 3), dtype=jnp.float32)
    concept_vec = jnp.zeros((batch_size, encoders.clip_dim), dtype=jnp.float32)
    return concept_embeddings, concept_ids, concept_vec
