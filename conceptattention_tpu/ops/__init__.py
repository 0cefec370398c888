from conceptattention_tpu.ops.rope import rope_table, embed_nd, apply_rope
from conceptattention_tpu.ops.norms import rms_norm, layer_norm, modulation
from conceptattention_tpu.ops.embeddings import timestep_embedding, mlp_embedder
from conceptattention_tpu.ops.schedule import get_schedule, time_shift
from conceptattention_tpu.ops.packing import (
    pack_latents,
    unpack_latents,
    make_img_ids,
    latent_noise_shape,
)
from conceptattention_tpu.ops.sparse import sparsemax, entmax15

__all__ = [
    "rope_table",
    "embed_nd",
    "apply_rope",
    "rms_norm",
    "layer_norm",
    "modulation",
    "timestep_embedding",
    "mlp_embedder",
    "get_schedule",
    "time_shift",
    "pack_latents",
    "unpack_latents",
    "make_img_ids",
    "latent_noise_shape",
    "sparsemax",
    "entmax15",
]
