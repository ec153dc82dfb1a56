"""Micro-benchmark of the whole-image manipulator path (edit/manipulator.py).

Measures, at a given image size / object count (random params — edit cost is
weight-independent):
  - device ms/image of the chunked whole-image edit (in-jit lax.scan over K
    images with a carry-folded input, scalar-fenced; see bench_field.py for
    why host-side repeat timing is useless on the axon tunnel), and
  - end-to-end ms/image of the real make_image_manipulator dispatch + D2H
    fetch, with and without --d2h_pack.

Reference economics: manipulator_render (reference manipulator.py:137-205)
does ~4.5x an eval render's field work per ray (64+192 ori + 64+192 tar +
320 ori-fine + 320*n_obj tar-fine samples).
"""

from __future__ import annotations

import argparse
import time
from types import SimpleNamespace


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hw", type=int, default=128, help="square image side")
    p.add_argument("--H", type=int, default=None)
    p.add_argument("--W", type=int, default=None)
    p.add_argument("--n_obj", type=int, default=1)
    p.add_argument("--chunk", type=int, default=512)
    p.add_argument("--k", type=int, default=8, help="in-jit repetitions")
    p.add_argument("--skip_e2e", action="store_true")
    args = p.parse_args()

    from dmnerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmnerf_tpu.edit.manipulator import (make_image_manipulator,
                                             manipulate_chunk, _field_fns,
                                             _fine_accum_fn)
    from dmnerf_tpu.models.fields import FieldConfig, init_field_params

    cfg = FieldConfig(ins_num=32)
    params = {"coarse": init_field_params(jax.random.PRNGKey(0), cfg),
              "fine": init_field_params(jax.random.PRNGKey(1), cfg)}
    H = args.H or args.hw
    W = args.W or args.hw
    n_rays = H * W
    assert n_rays % args.chunk == 0, (H, W, args.chunk)
    n_obj = args.n_obj
    ns = SimpleNamespace(N_samples=64, N_importance=128, near=2.0, far=6.0,
                         N_test=args.chunk, d2h_pack=False)

    key = jax.random.PRNGKey(2)
    ori_o = jax.random.normal(key, (n_rays, 3))
    ori_d = jax.random.normal(jax.random.PRNGKey(3), (n_rays, 3))
    ori_d = ori_d / jnp.linalg.norm(ori_d, axis=-1, keepdims=True)
    tar_os = jnp.stack([ori_o + 0.1 * (i + 1) for i in range(n_obj)])
    tar_ds = jnp.stack([ori_d for _ in range(n_obj)])
    move_labels = list(range(5, 5 + n_obj))

    # ---- device-only: scan K whole-image edits with carry-folded inputs
    coarse_fn, fine_fn = _field_fns(cfg, params, use_pallas=True)
    accum_fn = _fine_accum_fn(cfg, params, use_pallas=True)
    chunk = args.chunk
    nc = n_rays // chunk

    def one_image(oo_all, od_all, tos_all, tds_all):
        def one(c):
            oo, od, tos, tds = c
            rgb, ins, _, _ = manipulate_chunk(
                coarse_fn, fine_fn, (oo, od),
                [(tos[i], tds[i]) for i in range(n_obj)], move_labels,
                ns.N_samples, ns.N_importance, ns.near, ns.far,
                fine_accum_fn=accum_fn)
            return rgb, ins
        parts = (oo_all.reshape(nc, chunk, 3), od_all.reshape(nc, chunk, 3),
                 tos_all.reshape(n_obj, nc, chunk, 3).transpose(1, 0, 2, 3),
                 tds_all.reshape(n_obj, nc, chunk, 3).transpose(1, 0, 2, 3))
        rgb, ins = jax.lax.map(one, parts)
        return jnp.sum(rgb) + jnp.sum(ins)

    def scan_time(k):
        @jax.jit
        def many(c0):
            def body(c, _):
                return c + one_image(ori_o + c, ori_d, tar_os, tar_ds) * 1e-12, None
            c, _ = jax.lax.scan(body, c0, None, length=k)
            return c
        float(many(jnp.float32(0.0)))
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(many(jnp.float32(i + 1) * 1e-5))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = scan_time(1)
    tk = scan_time(args.k)
    dev_ms = (tk - t1) / (args.k - 1) * 1e3
    print(f"device edit: {dev_ms:8.1f} ms/image "
          f"({H}x{W}, {n_obj} obj, chunk {chunk})", flush=True)

    if args.skip_e2e:
        return

    # ---- end-to-end with D2H (pack off/on); one batched device_get fetch
    # (per-array np.asarray fetches pay the tunnel round-trip PER ARRAY:
    # measured 175 vs 37 ms for four 128x128 outputs)
    for pack in (False, True):
        ns.d2h_pack = pack
        run = make_image_manipulator(cfg, params, ns, n_obj, move_labels,
                                     n_rays, use_pallas=True)
        jax.device_get(run(ori_o, ori_d, tar_os, tar_ds))  # compile + warm
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            jax.device_get(run(ori_o + 1e-5 * (i + 1), ori_d, tar_os, tar_ds))
            best = min(best, time.perf_counter() - t0)
        print(f"e2e edit (pack={int(pack)}): {best * 1e3:8.1f} ms/image",
              flush=True)

    # ---- deployed pose-based dispatch: host poses in, in-graph raygen,
    # batched fetch (the runners' path)
    from dmnerf_tpu.edit.manipulator import make_pose_image_manipulator
    ns.d2h_pack = False
    ns.N_test = chunk
    Kmat = np.array([[W, 0, W / 2], [0, W, H / 2],
                     [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float64)
    pose[2, 3] = 4.0
    trans = np.eye(4, dtype=np.float64)
    trans[:3, 3] = [0.3, 0.0, 0.0]
    run_pose = make_pose_image_manipulator(
        cfg, params, ns, objs=[{"mode": "rigid"}] * n_obj,
        move_labels=move_labels, H=H, W=W, K=Kmat,
        use_pallas=True)
    zscale = jnp.zeros((n_obj,), jnp.float32)

    def pose_once(p):
        tar = np.stack([trans @ p] * n_obj)
        return jax.device_get(run_pose(jnp.asarray(p, jnp.float32),
                                       jnp.asarray(tar, jnp.float32), zscale))

    pose_once(pose)  # compile + warm
    best = float("inf")
    for i in range(3):
        p = pose.copy()
        p[0, 3] += 1e-3 * (i + 1)
        t0 = time.perf_counter()
        pose_once(p)
        best = min(best, time.perf_counter() - t0)
    print(f"e2e edit (poses):  {best * 1e3:8.1f} ms/image", flush=True)


if __name__ == "__main__":
    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
