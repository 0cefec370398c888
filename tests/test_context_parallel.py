"""Sequence/context parallelism: video forward with the 17k-token sequence
sharded over the `seq` mesh axis must match the unsharded result (GSPMD
inserts the all-gathers over what would be ICI on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from conceptattention_tpu.models.video.dit import (
    VideoDiTConfig,
    init_video_dit_params,
    make_video_ids,
    video_dit_forward,
)
from conceptattention_tpu.parallel.mesh import AXES, make_mesh

TINY = VideoDiTConfig(
    in_channels=8, text_dim=32, hidden_size=64, num_heads=4, depth=2,
    axes_dim=(8, 4, 4), theta=10_000,
)
B, T, C = 1, 4, 2
F, H, W = 4, 4, 4  # 64 video tokens, divisible by seq=4


def test_seq_sharded_video_forward_matches():
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 4)
    params = init_video_dit_params(keys[0], TINY, jnp.float32)
    video = jax.random.normal(keys[1], (B, F * H * W, TINY.in_channels))
    text = jax.random.normal(keys[2], (B, T, TINY.text_dim))
    concepts = jax.random.normal(keys[3], (B, C, TINY.text_dim))
    ids = make_video_ids(F, H, W, batch_size=B)
    ts = jnp.asarray([0.5])

    pred_ref, sal_ref = video_dit_forward(
        params, TINY, video, ids, text, ts, concepts=concepts
    )

    mesh = make_mesh(data=1, seq=4, model=2)
    seq_sharding = NamedSharding(mesh, P(None, AXES.seq, None))
    video_sharded = jax.device_put(video, seq_sharding)
    ids_sharded = jax.device_put(ids, seq_sharding)

    @jax.jit
    def fwd(params, video, ids, text, concepts):
        return video_dit_forward(params, TINY, video, ids, text, ts, concepts=concepts)

    pred_sp, sal_sp = fwd(params, video_sharded, ids_sharded, text, concepts)
    np.testing.assert_allclose(
        np.asarray(pred_ref), np.asarray(pred_sp), rtol=5e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(sal_ref["output"]), np.asarray(sal_sp["output"]),
        rtol=5e-4, atol=5e-5,
    )
