"""Benchmark: train + render + edit throughput on the reference workload.

Train workload matches the reference's shipped configs (BASELINE.md): 3072
rays/step, 64 coarse + 128 importance samples, two 8x256 MLPs (PE 10/4),
Hungarian-matched instance loss + emptiness penalizer — the full hot loop of
/root/reference/train_dmsr.py:24-64 — run as lax.scan'd multi-step dispatches
(the deployed training path). Render workload: full-image eval renders
(tester.py:55-77 equivalent) at N_test=4096 chunks. Edit workload: whole-image
1-object manipulation at the bench scene's 128x128 and the reference's
deployed 640x480 (loader_dmsr.py:38-45).

Process isolation (round-5): EVERY stage runs in its own child process. The
axon TPU is single-tenant and in-process co-residence between executables
measurably distorts step times (round-4: the K=64 step read ~85 ms co-resident
vs ~37 ms alone — allocator/executable-cache interference, docs/DESIGN.md
"Timing on this tunnel"). Rather than patch stages one by one as they grow,
the orchestrator (main) holds NO jax state at all: it spawns
`bench.py --stage {train32,k64,render,edit}` sequentially, each child prints
one `STAGE_RESULT {json}` line, and the parent assembles the final JSON. A
stage failure costs only its own fields (train32 is mandatory — it carries the
headline metric).

Timing within a stage: state feeds back between dispatches (the axon relay
memoizes identical dispatches, and 50 steps ride inside each jit), so
wall-clock is honest.

Prints ONE JSON line with the required keys {metric, value, unit, vs_baseline}
plus a roofline breakdown: ms/step, achieved model TFLOP/s, MFU vs the 197
TF/s v5e bf16 peak, and render-path rays/s. vs_baseline: the reference
publishes no throughput (SURVEY.md §6); we estimate its cu111-era single-GPU
rate at 15,000 rays/s (~5 it/s x 3072 rays) and report value / 15000.
"""

import json
import os
import subprocess
import sys
import time

ASSUMED_REFERENCE_RAYS_PER_SEC = 15_000.0
V5E_BF16_PEAK = 197e12

# The test-suite size these numbers were validated against (full lane:
# `pytest tests/ -q`; fast lane: `pytest -m "not oracle and not slow"`).
# tests/test_suite_count.py asserts this matches live collection so the
# emitted value cannot go stale.
VALIDATED_TEST_COUNT = 251


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


def _measure_train_ms(ins_num: int, pallas_train: bool, scan_steps: int,
                      n_dispatch: int):
    """Scan-step train timing at the given instance-slot count.
    Returns (ms_per_step, args, cfg)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmnerf_tpu.train.step import create_train_state, make_train_scan_step

    args, scene, cfg = _bench_workload(ins_num, pallas_train)
    state = create_train_state(jax.random.PRNGKey(0), cfg, args.lrate,
                               args.lrate_decay)
    step_fn = make_train_scan_step(args, cfg, scan_steps=scan_steps)
    arrs = scene.to_device_arrays()
    i_train = jnp.asarray(np.asarray(scene.i_train), jnp.int32)
    base_key = jax.random.PRNGKey(1)
    state, m = step_fn(state, arrs, base_key, i_train)  # compile + warm
    jax.block_until_ready(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        state, m = step_fn(state, arrs, base_key, i_train)
    jax.block_until_ready(m["total_loss"])
    ms = (time.perf_counter() - t0) / (n_dispatch * scan_steps) * 1e3
    return ms, args, cfg


def stage_train32(pallas_train: bool, scan_steps: int) -> dict:
    """Headline K=32 train throughput + roofline + 8-chip projection."""
    import jax

    from dmnerf_tpu.models.fields import init_field_params, param_count

    ms_step, args, cfg = _measure_train_ms(32, pallas_train, scan_steps,
                                           n_dispatch=4)
    train_rps = args.N_train / (ms_step / 1e3)
    per_field = param_count(init_field_params(jax.random.PRNGKey(9), cfg))
    flops = _train_flops_per_step(args.N_train, args.N_samples,
                                  args.N_importance, per_field)
    tfs = flops / (ms_step / 1e3) / 1e12
    mfu = tfs * 1e12 / V5E_BF16_PEAK

    # 8-chip projection (BASELINE.md names a v5p-8; this box has 1 chip).
    # DM-NeRF trains ray-parallel: per step the only cross-chip traffic is the
    # fp32 gradient psum over both fields + O(K^2) instance-loss stats. Ring
    # all-reduce moves 2(N-1)/N x payload per chip over ICI (~90 GB/s/link
    # v5e); the comm term is serialized here (no overlap assumed) so the
    # projection is conservative.
    n_params = 2 * per_field
    psum_mb = n_params * 4 / 1e6
    ici_bytes_per_s = 90e9
    n_proj = 8
    comm_ms = psum_mb * 1e6 * 2 * (n_proj - 1) / n_proj / ici_bytes_per_s * 1e3
    proj_eff = ms_step / (ms_step + comm_ms)
    proj_rps = n_proj * train_rps * proj_eff

    return {
        "train_rays_per_sec_per_chip": round(train_rps, 1),
        "ms_per_step": round(ms_step, 2),
        "model_tflops_per_sec": round(tfs, 1),
        "mfu_vs_bf16_peak": round(mfu, 3),
        "proj_8chip_grad_psum_mb": round(psum_mb, 2),
        "proj_8chip_comm_ms_per_step": round(comm_ms, 3),
        "proj_8chip_scaling_efficiency": round(proj_eff, 4),
        "proj_8chip_rays_per_sec": round(proj_rps, 0),
    }


def stage_k64(pallas_train: bool, scan_steps: int) -> dict:
    """K=64 instance-slot train variant (Replica-scale slot count)."""
    ms, _, _ = _measure_train_ms(64, pallas_train, scan_steps, n_dispatch=2)
    return {"ms_per_step_k64": round(ms, 2)}


def stage_render(pallas_train: bool) -> dict:
    """Full-image eval renders: the deployed (form='auto') and packed-D2H
    rates, plus an INTERLEAVED sample_pdf form A/B (round-5: the r03->r04
    render dip was attributed to the pdf-form change, but session drift is
    the same order — interleaving mask/matmul rounds in ONE process is the
    only way to separate them on this tunnel)."""
    import jax
    import numpy as np

    import dmnerf_tpu.core.sampling as sampling
    from dmnerf_tpu.eval.renderer import make_image_renderer
    from dmnerf_tpu.train.step import create_train_state

    args, scene, cfg = _bench_workload(32, pallas_train)
    params = create_train_state(jax.random.PRNGKey(0), cfg, args.lrate,
                                args.lrate_decay).params
    args.N_test = 4096
    poses = np.asarray(scene.poses[scene.i_test])
    K = np.asarray(scene.hwk[2])
    reps = 3
    poses_rep = np.concatenate([poses] * reps, 0)
    px = scene.H * scene.W * len(poses_rep)

    def build(form_override):
        prev = sampling.FORM_OVERRIDE
        sampling.FORM_OVERRIDE = form_override
        try:
            r = make_image_renderer(cfg, args, scene.H, scene.W,
                                    use_pallas=args.use_pallas)
            r(params, K, poses[0])  # compile + warm
        finally:
            sampling.FORM_OVERRIDE = prev
        return r

    def one_pass(r):
        t0 = time.perf_counter()
        for _ in r.many(params, K, poses_rep):  # pipelined D2H
            pass
        return time.perf_counter() - t0

    renderers = {"auto": build(None), "mask": build("mask"),
                 "matmul": build("matmul")}
    # interleaved rounds: every form sees the same slice of tunnel/session
    # conditions, so the form delta is separated from drift
    totals = {k: 0.0 for k in renderers}
    rounds = 3
    for _ in range(rounds):
        for k, r in renderers.items():
            totals[k] += one_pass(r)
    rates = {k: px * rounds / t for k, t in totals.items()}
    winner = max(("mask", "matmul"), key=lambda k: rates[k])

    # packed-D2H variant (--d2h_pack): device-side rgb->uint8 / conf,depth->
    # bf16 cuts the tunnel D2H from 24 to 8 B/px; pngs are bit-identical, f32
    # metrics parity runs keep the default unpacked path
    args.d2h_pack = True
    rp = make_image_renderer(cfg, args, scene.H, scene.W,
                             use_pallas=args.use_pallas)
    rp(params, K, poses[0])
    rate_packed = px / one_pass(rp)

    return {
        "render_rays_per_sec_per_chip": round(rates["auto"], 1),
        "render_rays_per_sec_packed_d2h": round(rate_packed, 1),
        "render_form_ab": {
            "mask": round(rates["mask"], 1),
            "matmul": round(rates["matmul"], 1),
            "winner": winner,
            "auto_within_1pct_of_winner":
                bool(rates["auto"] >= 0.99 * rates[winner]),
        },
    }


def stage_edit(pallas_train: bool) -> dict:
    """Whole-image 1-object edit, pipelined like the runners (dispatch image
    i+1 before fetching image i), at 128x128 and the reference's 640x480."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmnerf_tpu.edit.manipulator import make_pose_image_manipulator
    from dmnerf_tpu.edit.runner import _fetch_edit_image
    from dmnerf_tpu.train.step import create_train_state

    args, scene, cfg = _bench_workload(32, pallas_train)
    params = create_train_state(jax.random.PRNGKey(0), cfg, args.lrate,
                                args.lrate_decay).params
    args.N_test = 4096
    poses = np.asarray(scene.poses[scene.i_test])
    poses_rep = np.concatenate([poses] * 3, 0)
    K = np.asarray(scene.hwk[2])
    trans = np.eye(4, dtype=np.float64)
    trans[:3, 3] = [0.3, 0.0, 0.0]
    zero_scales = jnp.zeros((1,), jnp.float32)

    def measure_edit(H, W, Km, bench_poses):
        run_edit = make_pose_image_manipulator(
            cfg, params, args, objs=[{"mode": "rigid"}],
            move_labels=[1], H=H, W=W, K=Km, use_pallas=args.use_pallas)

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
    return {
        "edit_ms_per_image": round(edit_ms, 1),
        "edit_ms_per_image_640x480": round(edit_ms_640, 1),
    }


STAGES = {
    "train32": lambda pt, ss: stage_train32(pt, ss),
    "k64": lambda pt, ss: stage_k64(pt, ss),
    "render": lambda pt, ss: stage_render(pt),
    "edit": lambda pt, ss: stage_edit(pt),
}


def run_stage(name: str, pallas_train: bool, scan_steps: int) -> None:
    from dmnerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    print("STAGE_RESULT " + json.dumps(STAGES[name](pallas_train, scan_steps)),
          flush=True)


def _spawn_stage(name: str, pallas_train: bool):
    """One stage in its own process; returns its dict or None on failure."""
    cmd = [sys.executable, os.path.abspath(__file__), "--stage", name]
    if not pallas_train:
        cmd.append("--no_pallas_train")
    try:
        # 3600s: tunnel-side fresh compiles were observed at ~16 min/program
        # on a cold cache (round-5; the persistent cache makes reruns fast)
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        for line in out.stdout.splitlines():
            if line.startswith("STAGE_RESULT "):
                return json.loads(line[len("STAGE_RESULT "):])
        print(f"bench: stage {name} produced no result: "
              f"{out.stderr[-500:]}", file=sys.stderr)
    except Exception as e:  # pragma: no cover - diagnostic guard
        print(f"bench: stage {name} failed: {e!r}", file=sys.stderr)
    return None


def main(scan_steps: int = 50, pallas_train: bool = True):
    """Orchestrator: no jax in this process — every measurement runs in its
    own child so no stage's allocator/executable residency can distort
    another's timing (single-tenant axon tunnel)."""
    results = {}
    failed = []
    for name in ("train32", "k64", "render", "edit"):
        r = _spawn_stage(name, pallas_train)
        if r is None:
            failed.append(name)
        else:
            results.update(r)
    if "train_rays_per_sec_per_chip" not in results:
        raise SystemExit("bench: mandatory train32 stage failed")

    value = results.pop("train_rays_per_sec_per_chip")
    out = {
        "metric": "train_rays_per_sec_per_chip",
        "value": value,
        "unit": "rays/s/chip",
        "vs_baseline": round(value / ASSUMED_REFERENCE_RAYS_PER_SEC, 3),
    }
    out.update(results)
    out.update({
        "pallas_train": bool(pallas_train),
        "scan_steps_per_dispatch": scan_steps,
        "stage_isolation": "one process per stage",
        "failed_stages": failed or None,
        "validated_against_n_tests": VALIDATED_TEST_COUNT,
    })
    print(json.dumps(out))


if __name__ == "__main__":
    pt = "--no_pallas_train" not in sys.argv
    if "--stage" in sys.argv:
        run_stage(sys.argv[sys.argv.index("--stage") + 1],
                  pallas_train=pt, scan_steps=50)
    else:
        main(pallas_train=pt)
