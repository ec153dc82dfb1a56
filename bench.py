"""Benchmark: train + render throughput on the reference workload.

Train workload matches the reference's shipped configs (BASELINE.md): 3072
rays/step, 64 coarse + 128 importance samples, two 8x256 MLPs (PE 10/4),
Hungarian-matched instance loss + emptiness penalizer — the full hot loop of
/root/reference/train_dmsr.py:24-64 — run as lax.scan'd multi-step dispatches
(the deployed training path). Render workload: full-image eval renders
(tester.py:55-77 equivalent) at N_test=4096 chunks.

Timing: state feeds back between dispatches (the axon relay memoizes identical
dispatches, and 50 steps ride inside each jit), so wall-clock is honest.

Prints ONE JSON line with the required keys {metric, value, unit, vs_baseline}
plus a roofline breakdown: ms/step, achieved model TFLOP/s, MFU vs the 197
TF/s v5e bf16 peak, and render-path rays/s. vs_baseline: the reference
publishes no throughput (SURVEY.md §6); we estimate its cu111-era single-GPU
rate at 15,000 rays/s (~5 it/s x 3072 rays) and report value / 15000.
"""

import json
import time

ASSUMED_REFERENCE_RAYS_PER_SEC = 15_000.0
V5E_BF16_PEAK = 197e12

# The test-suite size these numbers were validated against (full lane:
# `pytest tests/ -q`; fast lane: `pytest -m "not oracle and not slow"`).
# tests/test_suite_count.py asserts this matches live collection so the
# emitted value cannot go stale.
VALIDATED_TEST_COUNT = 221


def _train_flops_per_step(n_train, n_samples, n_importance, params_per_field):
    """Model FLOPs (fwd + 2x bwd) of both field evaluations per train step."""
    pts = n_train * (n_samples + (n_samples + n_importance))
    return 3 * 2 * params_per_field * pts


def _bench_workload(ins_num: int, pallas_train: bool):
    """Shared bench scene/args: the reference train workload with the scene's
    4 labels spatially subdivided into ins_num pseudo-objects so valid slots
    per batch look like a real view (DMSR ~25-32/32; Replica ships 59+
    object codes, loader_replica.py:78-97)."""
    import numpy as np

    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.data.synthetic import make_scene
    from dmnerf_tpu.models.fields import FieldConfig

    args = default_config(
        N_train=3072, N_samples=64, N_importance=128,
        near=1.0, far=12.0, perturb=1.0,
        penalize=True, tolerance=0.05, deta_w=0.05,
        lrate=5e-4, lrate_decay=500, precision="bf16",
        netdepth=8, netwidth=256, multires=10, multires_views=4,
        pallas_train=pallas_train,
    )
    scene = make_scene(H=128, W=128, n_train=4, n_test=4)
    per = ins_num // 4
    yy, xx = np.meshgrid(np.arange(scene.H), np.arange(scene.W), indexing="ij")
    sub = (((yy * (per // 4)) // scene.H) * 4
           + ((xx * 4) // scene.W))                   # [H, W] 0..per-1
    scene.gt_labels = (scene.gt_labels * per + sub[None]).astype(
        scene.gt_labels.dtype)
    args.ins_num = ins_num
    return args, scene, FieldConfig.from_args(args)


def measure_k64(scan_steps: int = 50, pallas_train: bool = True) -> None:
    """Standalone K=64 train-step measurement (run in its OWN process: the
    axon TPU is single-tenant and in-process co-residence with the K=32
    bench measurably distorts this number — 85 vs 37 ms/step, round-4 note
    in docs/DESIGN.md). Prints 'k64_ms_per_step <float>'."""
    from dmnerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmnerf_tpu.train.step import create_train_state, make_train_scan_step

    args, scene, cfg = _bench_workload(64, pallas_train)
    state = create_train_state(jax.random.PRNGKey(0), cfg, args.lrate,
                               args.lrate_decay)
    step_fn = make_train_scan_step(args, cfg, scan_steps=scan_steps)
    arrs = scene.to_device_arrays()
    i_train = jnp.asarray(np.asarray(scene.i_train), jnp.int32)
    base_key = jax.random.PRNGKey(1)
    state, m = step_fn(state, arrs, base_key, i_train)  # compile + warm
    jax.block_until_ready(m["total_loss"])
    n_dispatch = 2
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        state, m = step_fn(state, arrs, base_key, i_train)
    jax.block_until_ready(m["total_loss"])
    ms = (time.perf_counter() - t0) / (n_dispatch * scan_steps) * 1e3
    print(f"k64_ms_per_step {ms:.4f}")


def main(scan_steps: int = 50, pallas_train: bool = True):
    # ---- K=64 train variant, measured FIRST in a clean child process (the
    # single-tenant TPU is untouched by this process until the child exits)
    ms_step_k64 = None
    try:
        import os as _os
        import subprocess as _sp
        import sys as _sys
        cmd = [_sys.executable, _os.path.abspath(__file__), "--k64_only"]
        if not pallas_train:
            cmd.append("--no_pallas_train")
        out = _sp.run(cmd, capture_output=True, text=True, timeout=1800)
        for line in out.stdout.splitlines():
            if line.startswith("k64_ms_per_step"):
                ms_step_k64 = float(line.split()[1])
        if ms_step_k64 is None:
            print(f"bench: K=64 child produced no number: "
                  f"{out.stderr[-500:]}", file=_sys.stderr)
    except Exception as e:  # pragma: no cover - diagnostic guard
        import sys as _sys
        print(f"bench: K=64 train variant failed: {e!r}", file=_sys.stderr)

    from dmnerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmnerf_tpu.models.fields import param_count, init_field_params
    from dmnerf_tpu.train.step import create_train_state, make_train_scan_step

    args, scene, cfg = _bench_workload(32, pallas_train)
    # this bench runs WITHOUT a mesh (the driver's box exposes one chip);
    # dividing by len(jax.devices()) would misreport per-chip rates on a
    # multi-chip host where the un-meshed work runs on device 0 only
    n_chips = 1

    # ---- train path ----
    state = create_train_state(jax.random.PRNGKey(0), cfg, args.lrate, args.lrate_decay)
    step_fn = make_train_scan_step(args, cfg, scan_steps=scan_steps)
    arrs = scene.to_device_arrays()
    i_train = jnp.asarray(np.asarray(scene.i_train), jnp.int32)
    base_key = jax.random.PRNGKey(1)

    state, m = step_fn(state, arrs, base_key, i_train)  # compile + warm
    jax.block_until_ready(m["total_loss"])

    n_dispatch = 4
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        state, m = step_fn(state, arrs, base_key, i_train)
    jax.block_until_ready(m["total_loss"])
    dt = time.perf_counter() - t0

    n_steps = scan_steps * n_dispatch
    train_rps = args.N_train * n_steps / dt / n_chips
    ms_step = dt / n_steps * 1e3
    flops = _train_flops_per_step(
        args.N_train, args.N_samples, args.N_importance,
        param_count(init_field_params(jax.random.PRNGKey(9), cfg)))
    tfs = flops / (dt / n_steps) / 1e12
    mfu = tfs * 1e12 / V5E_BF16_PEAK

    # ---- render path (full-image eval, one dispatch per image) ----
    from dmnerf_tpu.eval.renderer import make_image_renderer
    args.N_test = 4096
    render_im = make_image_renderer(cfg, args, scene.H, scene.W,
                                    use_pallas=args.use_pallas)
    poses = np.asarray(scene.poses[scene.i_test])
    K = np.asarray(scene.hwk[2])
    render_im(state.params, K, poses[0])  # compile
    t0 = time.perf_counter()
    reps = 3
    poses_rep = np.concatenate([poses] * reps, 0)
    for _ in render_im.many(state.params, K, poses_rep):  # pipelined D2H
        pass
    rdt = time.perf_counter() - t0
    render_rps = scene.H * scene.W * len(poses_rep) / rdt / n_chips

    # packed-D2H variant (--d2h_pack): device-side rgb->uint8 / conf,depth->
    # bf16 cuts the tunnel D2H from 24 to 8 B/px; pngs are bit-identical, f32
    # metrics parity runs keep the default unpacked path
    args.d2h_pack = True
    render_pack = make_image_renderer(cfg, args, scene.H, scene.W,
                                      use_pallas=args.use_pallas)
    render_pack(state.params, K, poses[0])  # compile
    t0 = time.perf_counter()
    for _ in render_pack.many(state.params, K, poses_rep):
        pass
    rdt_p = time.perf_counter() - t0
    render_rps_packed = scene.H * scene.W * len(poses_rep) / rdt_p / n_chips
    args.d2h_pack = False

    # ---- edit path (L7 whole-image manipulation, 1 object, pipelined like
    # the runners: dispatch image i+1 before fetching image i). Guarded so an
    # edit-path failure cannot cost the train/render numbers.
    edit_ms = edit_ms_640 = None
    try:
        from dmnerf_tpu.edit.manipulator import make_pose_image_manipulator
        from dmnerf_tpu.edit.runner import _fetch_edit_image
        trans = np.eye(4, dtype=np.float64)
        trans[:3, 3] = [0.3, 0.0, 0.0]
        zero_scales = jnp.zeros((1,), jnp.float32)

        def measure_edit(H, W, Km, bench_poses):
            run_edit = make_pose_image_manipulator(
                cfg, state.params, args, objs=[{"mode": "rigid"}],
                move_labels=[1], H=H, W=W, K=Km,
                use_pallas=args.use_pallas)

            def edit_dispatch(pose):
                # deployed dispatch: poses-only H2D, rays generated in-graph
                outs = run_edit(jnp.asarray(pose, jnp.float32),
                                jnp.asarray((trans @ pose)[None], jnp.float32),
                                zero_scales)
                return outs, H * W

            _fetch_edit_image(edit_dispatch(bench_poses[0]))  # compile + warm
            t0 = time.perf_counter()
            pending = None
            for pose in bench_poses:
                cur = edit_dispatch(pose)
                if pending is not None:
                    _fetch_edit_image(pending)
                pending = cur
            _fetch_edit_image(pending)
            return (time.perf_counter() - t0) / len(bench_poses) * 1e3

        edit_ms = measure_edit(scene.H, scene.W, K, poses_rep)
        # reference-resolution edit (DM-SR ships 640x480, loader_dmsr.py:38-45;
        # intrinsics scaled from the bench scene's — edit cost is K-invariant)
        K640 = np.array([[640.0, 0, 320.0], [0, 640.0, 240.0], [0, 0, 1.0]],
                        np.float32)
        edit_ms_640 = measure_edit(480, 640, K640, poses_rep[:3])
    except Exception as e:  # pragma: no cover - diagnostic guard
        import sys as _sys
        print(f"bench: edit path failed: {e!r}", file=_sys.stderr)

    # ---- 8-chip projection (BASELINE.md names a v5p-8; this box has 1 chip).
    # DM-NeRF trains ray-parallel: per step the only cross-chip traffic is the
    # fp32 gradient psum over both fields + O(K^2) instance-loss stats. Ring
    # all-reduce moves 2(N-1)/N x payload per chip over ICI (~90 GB/s/link
    # v5e); the comm term is serialized here (no overlap assumed) so the
    # projection is conservative.
    n_params = 2 * param_count(init_field_params(jax.random.PRNGKey(9), cfg))
    psum_mb = n_params * 4 / 1e6
    ici_bytes_per_s = 90e9
    n_proj = 8
    comm_ms = psum_mb * 1e6 * 2 * (n_proj - 1) / n_proj / ici_bytes_per_s * 1e3
    proj_eff = ms_step / (ms_step + comm_ms)
    proj_rps = n_proj * train_rps * proj_eff

    value = round(train_rps, 1)
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": value,
        "unit": "rays/s/chip",
        "vs_baseline": round(value / ASSUMED_REFERENCE_RAYS_PER_SEC, 3),
        "ms_per_step": round(ms_step, 2),
        "ms_per_step_k64": (round(ms_step_k64, 2)
                            if ms_step_k64 is not None else None),
        "model_tflops_per_sec": round(tfs, 1),
        "mfu_vs_bf16_peak": round(mfu, 3),
        "render_rays_per_sec_per_chip": round(render_rps, 1),
        "render_rays_per_sec_packed_d2h": round(render_rps_packed, 1),
        "edit_ms_per_image": round(edit_ms, 1) if edit_ms is not None else None,
        "edit_ms_per_image_640x480": (round(edit_ms_640, 1)
                                      if edit_ms_640 is not None else None),
        "pallas_train": bool(pallas_train),
        "scan_steps_per_dispatch": scan_steps,
        "proj_8chip_grad_psum_mb": round(psum_mb, 2),
        "proj_8chip_comm_ms_per_step": round(comm_ms, 3),
        "proj_8chip_scaling_efficiency": round(proj_eff, 4),
        "proj_8chip_rays_per_sec": round(proj_rps, 0),
        "validated_against_n_tests": VALIDATED_TEST_COUNT,
    }))


if __name__ == "__main__":
    import sys
    pt = "--no_pallas_train" not in sys.argv
    if "--k64_only" in sys.argv:
        measure_k64(pallas_train=pt)
    else:
        main(pallas_train=pt)
