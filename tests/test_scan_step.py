"""Multi-step scan training: K steps per dispatch must equal K single-step
dispatches, and the loop's interrupted+resumed run must replay the exact
uninterrupted sequence (all per-step randomness derives from (seed, step))."""

import json
import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.config import default_config
from dmnerf_tpu.data.synthetic import make_scene
from dmnerf_tpu.models.fields import FieldConfig
from dmnerf_tpu.train.step import create_train_state, make_train_scan_step


def tiny_args(**kw):
    args = default_config(
        N_train=64, N_samples=8, N_importance=8,
        near=1.0, far=12.0, perturb=1.0,
        penalize=True, tolerance=0.05, deta_w=0.05,
        lrate=5e-3, lrate_decay=500, precision="f32", pallas_train=False,
        netdepth=2, netwidth=32, multires=4, multires_views=2,
    )
    for k, v in kw.items():
        setattr(args, k, v)
    return args


@pytest.mark.slow
def test_scan_matches_single_steps():
    scene = make_scene(H=16, W=16, n_train=3, n_test=1)
    args = tiny_args()
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)
    arrs = scene.to_device_arrays()
    i_train = jnp.asarray(np.asarray(scene.i_train), jnp.int32)
    base_key = jax.random.PRNGKey(7)

    s4 = create_train_state(jax.random.PRNGKey(0), cfg)
    step4 = make_train_scan_step(args, cfg, scan_steps=4)
    s4, m4 = step4(s4, arrs, base_key, i_train)

    s1 = create_train_state(jax.random.PRNGKey(0), cfg)
    step1 = make_train_scan_step(args, cfg, scan_steps=1)
    for _ in range(4):
        s1, m1 = step1(s1, arrs, base_key, i_train)

    assert int(s4.step) == int(s1.step) == 4
    np.testing.assert_allclose(float(m4["total_loss"]), float(m1["total_loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s4.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_loop_resume_replays_uninterrupted_run(tmp_path):
    """VERDICT r1 item 7: N steps + resume + N steps == 2N steps, bit-for-bit
    metrics (the reference's host RNG cannot do this, train_dmsr.py:25)."""
    from dmnerf_tpu.train.loop import train

    scene = make_scene(H=16, W=16, n_train=3, n_test=1)

    def mk_args(tag):
        args = tiny_args()
        args.expname = "resume_t"
        args.basedir = str(tmp_path / tag)
        args.log_time = "t"
        args.i_print = 2
        args.i_save = 4
        args.i_test = 0
        args.seed = 3
        return args

    # uninterrupted: 8 steps
    a_full = mk_args("full")
    s_full = train(a_full, scene, n_iters=8, eval_every=0, scan_steps=2)

    # interrupted: 4 steps, then a FRESH train() with resume
    a_int = mk_args("int")
    train(a_int, scene, n_iters=4, eval_every=0, scan_steps=2)
    a_res = mk_args("int")
    a_res.resume = True
    s_res = train(a_res, scene, n_iters=8, eval_every=0, scan_steps=2)

    assert int(s_res.step) == int(s_full.step) == 8
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # metrics.jsonl streams agree on the shared steps, no duplicate rows
    def rows(tag):
        path = os.path.join(str(tmp_path / tag), "resume_t", "t", "metrics.jsonl")
        return [json.loads(l) for l in open(path)]

    full_rows = {r["step"]: r for r in rows("full")}
    int_rows = [r for r in rows("int")]
    steps_seen = [r["step"] for r in int_rows]
    assert len(steps_seen) == len(set(steps_seen)), "duplicate metrics rows"
    for r in int_rows:
        np.testing.assert_allclose(r["total_loss"],
                                   full_rows[r["step"]]["total_loss"], rtol=1e-5)


@pytest.mark.slow
def test_loop_tail_dispatch(tmp_path):
    """n_iters not divisible by scan_steps: the remainder runs as a tail scan
    and the final step count is exact (the reference's 500001-iteration budget
    is odd, train_dmsr.py:20)."""
    from dmnerf_tpu.train.loop import train

    scene = make_scene(H=16, W=16, n_train=2, n_test=1)
    args = tiny_args()
    args.expname = "tail_t"
    args.basedir = str(tmp_path)
    args.log_time = "t"
    args.i_print = 100
    args.i_save = 100
    args.i_test = 0
    args.seed = 0
    s = train(args, scene, n_iters=7, eval_every=0, scan_steps=4)
    assert int(s.step) == 7


@pytest.mark.slow
def test_profile_steps_writes_trace(tmp_path):
    """--profile_steps N captures a jax.profiler trace of steady-state
    dispatches into {logdir}/profile (SURVEY §5: reference has no tracing)."""
    import glob
    import os

    from dmnerf_tpu.train.loop import train

    scene = make_scene(H=16, W=16, n_train=2, n_test=1)
    args = tiny_args()
    args.expname = "prof_t"
    args.basedir = str(tmp_path)
    args.log_time = "t"
    args.i_print = 2
    args.i_save = 100
    args.i_test = 0
    args.seed = 0
    args.profile_steps = 1
    train(args, scene, n_iters=4, eval_every=0, scan_steps=2)
    prof = os.path.join(str(tmp_path), "prof_t", "t", "profile")
    assert glob.glob(os.path.join(prof, "**", "*.trace.json.gz"),
                     recursive=True), "no trace written"


@pytest.mark.slow
def test_loop_cadences_fire_with_non_dividing_stride(tmp_path):
    """--scan_steps that doesn't divide i_save/i_print: triggers fire on
    crossing each multiple instead of silently never (code-review r2)."""
    import glob
    import os

    from dmnerf_tpu.train.loop import train

    scene = make_scene(H=16, W=16, n_train=2, n_test=1)
    args = tiny_args()
    args.expname = "stride_t"
    args.basedir = str(tmp_path)
    args.log_time = "t"
    args.i_print = 4
    args.i_save = 4
    args.i_test = 0
    args.seed = 0
    s = train(args, scene, n_iters=10, eval_every=0, scan_steps=3)
    assert int(s.step) == 10
    ldir = os.path.join(str(tmp_path), "stride_t", "t")
    # save multiples 4 and 8 crossed at done=6 and done=9; the final state
    # (10) is always saved so test-time never loses the tail steps
    ckpts = sorted(os.path.basename(p) for p in glob.glob(os.path.join(ldir, "ckpt_*")))
    assert ckpts == ["ckpt_000006", "ckpt_000009", "ckpt_000010"], ckpts
    rows = [l for l in open(os.path.join(ldir, "metrics.jsonl"))]
    assert len(rows) >= 3  # printed at 6, 9, 10(final)
