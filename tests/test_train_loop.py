"""Training loop: LR schedule, grad accumulation, EMA, checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np

from conceptattention_tpu.config import FluxConfig
from conceptattention_tpu.models.flux.params import init_flux_params
from conceptattention_tpu.ops.packing import make_img_ids
from conceptattention_tpu.training.train_loop import (
    TrainConfig,
    latest_checkpoint,
    make_lr_schedule,
    make_optimizer,
    train_loop,
)

TINY = FluxConfig(
    in_channels=4, vec_in_dim=8, context_in_dim=8, hidden_size=32,
    mlp_ratio=2.0, num_heads=2, depth=2, depth_single_blocks=1,
    axes_dim=(4, 6, 6), qkv_bias=True, guidance_embed=False,
)


def _data_stream(seed=0):
    b, p_tok, t_tok = 2, 16, 4
    base = jax.random.PRNGKey(seed)
    i = 0
    while True:
        k = jax.random.fold_in(base, i)
        ks = jax.random.split(k, 3)
        yield {
            "img": jax.random.normal(ks[0], (b, p_tok, TINY.in_channels)),
            "img_ids": make_img_ids(4, 4, b),
            "txt": jax.random.normal(ks[1], (b, t_tok, TINY.context_in_dim)),
            "txt_ids": jnp.zeros((b, t_tok, 3)),
            "y": jax.random.normal(ks[2], (b, TINY.vec_in_dim)),
        }
        i += 1


def test_lr_schedule_shape():
    tc = TrainConfig(total_steps=100, learning_rate=1e-3, warmup_steps=10)
    sched = make_lr_schedule(tc)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1e-3) < 1e-9        # peak after warmup
    assert float(sched(100)) <= 1e-4 + 1e-9           # cosine floor 0.1x
    assert float(sched(50)) < float(sched(10))


def test_lr_schedule_units_under_grad_accum():
    """MultiSteps advances the inner schedule once per OPTIMIZER update, so
    the schedule must be built in update units: 1000 micro-steps at
    grad_accum=4 = 250 updates, and the cosine must reach its floor at 250
    (not 1/4 of the way down as with micro-step units)."""
    tc = TrainConfig(total_steps=1000, learning_rate=1e-3, warmup_steps=100,
                     grad_accum=4)
    sched = make_lr_schedule(tc)
    updates = tc.total_steps // tc.grad_accum            # 250
    warm = tc.warmup_steps // tc.grad_accum              # 25
    assert abs(float(sched(warm)) - 1e-3) < 1e-9         # peak after warmup
    assert float(sched(updates)) <= 1e-4 + 1e-9          # floor reached


def test_loop_trains_and_ema_lags(tmp_path):
    params = init_flux_params(jax.random.PRNGKey(0), TINY, jnp.float32)
    tc = TrainConfig(total_steps=8, learning_rate=3e-3, warmup_steps=1,
                     ema_decay=0.9, log_every=100)
    p0 = np.array(jax.tree.leaves(params)[0])  # snapshot before donation
    out = train_loop(params, TINY, _data_stream(), tc)
    assert out["step"] == 8 and len(out["losses"]) == 8
    # training moves params; EMA lags behind them (not equal to either end)
    p1 = jax.tree.leaves(out["params"])[0]
    e1 = jax.tree.leaves(out["ema"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    assert not np.allclose(np.asarray(p1), np.asarray(e1))
    # loss trends down on the repeating-distribution stream
    assert np.mean(out["losses"][-3:]) < np.mean(out["losses"][:3])


def test_grad_accum_updates_less_often():
    params = init_flux_params(jax.random.PRNGKey(0), TINY, jnp.float32)
    tc = TrainConfig(total_steps=2, learning_rate=1e-3, warmup_steps=0,
                     grad_accum=2, ema_decay=0.0, log_every=100)
    tx = make_optimizer(tc)
    from conceptattention_tpu.training.train_loop import make_loop_step

    step = make_loop_step(TINY, tc, tx)
    stream = _data_stream()
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(1)
    snap0 = [np.array(a) for a in jax.tree.leaves(params)]
    ema = jax.tree.map(jnp.copy, params)  # donation: never alias params/ema
    p1, ema, opt_state, _ = step(params, ema, opt_state, next(stream), key)
    # first micro-step of an accumulation pair: params unchanged
    for a, b in zip(snap0, jax.tree.leaves(p1)):
        np.testing.assert_array_equal(a, np.asarray(b))
    snap1 = [np.array(a) for a in jax.tree.leaves(p1)]
    p2, ema, opt_state, _ = step(p1, ema, opt_state, next(stream), key)
    assert not all(
        np.allclose(a, np.asarray(b))
        for a, b in zip(snap1, jax.tree.leaves(p2))
    )


def test_checkpoint_resume(tmp_path):
    params = init_flux_params(jax.random.PRNGKey(0), TINY, jnp.float32)
    ckpt = str(tmp_path / "ckpts")
    tc = TrainConfig(total_steps=6, learning_rate=1e-3, warmup_steps=0,
                     ema_decay=0.9, checkpoint_dir=ckpt, checkpoint_every=4,
                     log_every=100)
    # "interrupted" run: only 4 of 6 steps
    tc_short = TrainConfig(**{**tc.__dict__, "total_steps": 4})
    out1 = train_loop(params, TINY, _data_stream(), tc_short)
    assert latest_checkpoint(ckpt)[0] == 4

    logs = []
    out2 = train_loop(params, TINY, _data_stream(), tc, log=logs.append)
    assert any("resumed" in m and "step 4" in m for m in logs)
    assert out2["step"] == 6 and len(out2["losses"]) == 2  # only steps 5-6 ran
    # the resumed params start from the checkpoint, not from init
    a = np.asarray(jax.tree.leaves(out1["params"])[0])
    b = np.asarray(jax.tree.leaves(out2["params"])[0])
    assert not np.allclose(np.asarray(a), np.asarray(b))  # 2 more steps moved them


def test_resume_matches_uninterrupted_run(tmp_path):
    """The core resume promise: a run interrupted at step 3 and resumed is
    BIT-IDENTICAL to an uninterrupted run — same per-step RNG keys (fold_in by
    index), same data (stream advanced past consumed batches), and the same
    optimizer state (adam moments + schedule count restore from the
    checkpoint rather than restarting warmup from LR ~0)."""
    params = init_flux_params(jax.random.PRNGKey(0), TINY, jnp.float32)
    base = dict(total_steps=6, learning_rate=3e-3, warmup_steps=2,
                ema_decay=0.9, checkpoint_every=3, log_every=100)

    straight = train_loop(params, TINY, _data_stream(),
                          TrainConfig(**base))  # no checkpoint_dir: one shot

    ckpt = str(tmp_path / "ckpts")
    tc = TrainConfig(**base, checkpoint_dir=ckpt)
    train_loop(params, TINY, _data_stream(),
               TrainConfig(**{**tc.__dict__, "total_steps": 3}))
    resumed = train_loop(params, TINY, _data_stream(), tc)

    for s, r in zip(jax.tree.leaves(straight["params"]),
                    jax.tree.leaves(resumed["params"])):
        np.testing.assert_array_equal(np.asarray(s), np.asarray(r))
    for s, r in zip(jax.tree.leaves(straight["ema"]),
                    jax.tree.leaves(resumed["ema"])):
        np.testing.assert_array_equal(np.asarray(s), np.asarray(r))
