"""Sequence/context parallelism: video forward with the token sequence
sharded over the `seq` mesh axis must match the unsharded result (GSPMD
inserts the all-gathers over what would be ICI on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from conceptattention_tpu.models.video.dit import (
    CogVideoXConfig,
    init_video_dit_params,
    video_dit_forward,
)
from conceptattention_tpu.parallel.mesh import AXES, make_mesh

TINY = CogVideoXConfig(
    num_attention_heads=4,
    attention_head_dim=16,
    in_channels=4,
    out_channels=4,
    time_embed_dim=8,
    text_embed_dim=32,
    num_layers=2,
    sample_width=8,
    sample_height=8,
    sample_frames=13,
    max_text_seq_length=4,
    use_rotary_positional_embeddings=True,
)
B, T, C = 1, 4, 2
F, H, W = 4, 8, 8  # 4 frames, sharded over seq=4


def test_seq_sharded_video_forward_matches():
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 4)
    params = init_video_dit_params(keys[0], TINY, jnp.float32)
    video = jax.random.normal(keys[1], (B, F, TINY.in_channels, H, W))
    text = jax.random.normal(keys[2], (B, T, TINY.text_embed_dim))
    concepts = jax.random.normal(keys[3], (B, C, TINY.text_embed_dim))
    ts = jnp.asarray([500.0])

    pred_ref, sal_ref = video_dit_forward(
        params, TINY, video, text, ts, concepts=concepts
    )

    mesh = make_mesh(data=1, seq=4, model=2)
    # Shard the frame axis: tokens are (frame, y, x)-ordered so this is a
    # contiguous sequence split.
    seq_sharding = NamedSharding(mesh, P(None, AXES.seq, None, None, None))
    video_sharded = jax.device_put(video, seq_sharding)

    @jax.jit
    def fwd(params, video, text, concepts):
        return video_dit_forward(params, TINY, video, text, ts, concepts=concepts)

    pred_sp, sal_sp = fwd(params, video_sharded, text, concepts)
    np.testing.assert_allclose(
        np.asarray(pred_ref), np.asarray(pred_sp), rtol=5e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(sal_ref["output"]), np.asarray(sal_sp["output"]),
        rtol=5e-4, atol=5e-5,
    )
