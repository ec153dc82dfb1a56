"""Two-process distributed CPU dryrun: certify nothing assumes one process.

The deployment target (v5p-8) is single-host, so multi-process execution is
never exercised by the driver's virtual-device dryrun — every jax.Array there
is fully addressable. This tool runs the REAL sharded training dispatch over
a 2-process x 4-virtual-CPU-device mesh via `jax.distributed`, where each
process only addresses half the mesh: inputs must be built as global arrays
(host data + NamedSharding), not process-local jnp buffers, and metrics must
be read through addressable shards. SURVEY.md §5's DCN note is the match.

Usage:
  python tools/dryrun_two_proc.py            # parent: spawns 2 children
  python tools/dryrun_two_proc.py --proc I --port P   # child (internal)

Prints 'two_proc_dryrun: ok loss=<x>' from each process on success.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def child(proc_id: int, port: int, n_local: int = 4) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local} "
        + os.environ.get("XLA_FLAGS", ""))
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=proc_id)
    import jax.numpy as jnp
    import numpy as np

    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.data.synthetic import make_scene
    from dmnerf_tpu.models.fields import FieldConfig
    from dmnerf_tpu.parallel.mesh import make_mesh, put_replicated
    from dmnerf_tpu.train.step import create_train_state, make_train_scan_step

    n_dev = 2 * n_local
    assert len(jax.devices()) == n_dev, \
        f"global devices {len(jax.devices())} != {n_dev}"
    assert len(jax.local_devices()) == n_local
    mesh = make_mesh(n_dev)

    scene = make_scene(H=16, W=16, n_train=2, n_test=1)
    args = default_config(
        N_train=16 * n_dev, N_samples=8, N_importance=8,
        near=1.0, far=12.0, perturb=1.0,
        penalize=True, tolerance=0.05, deta_w=0.05,
        lrate=5e-4, lrate_decay=500, precision="f32",
        netdepth=2, netwidth=32, multires=4, multires_views=2,
    )
    args.ins_num = scene.ins_num
    cfg = FieldConfig.from_args(args)

    # Global arrays from identical host data on every process: state/scene as
    # numpy (same PRNG seed everywhere) device_put to the replicated sharding
    # over the GLOBAL mesh — a process-local jnp.asarray would be committed to
    # this process's device 0 and rejected by the global-mesh jit.
    state = create_train_state(jax.random.PRNGKey(0), cfg, args.lrate,
                               args.lrate_decay)
    state = put_replicated(jax.tree_util.tree_map(np.asarray, state), mesh)
    arrs = scene.to_device_arrays()
    arrs = put_replicated(jax.tree_util.tree_map(np.asarray, arrs), mesh)
    i_train = np.asarray(scene.i_train, np.int32)
    base_key = np.asarray(jax.random.PRNGKey(1))

    step_fn = make_train_scan_step(args, cfg, mesh=mesh, scan_steps=2)
    state, metrics = step_fn(state, arrs, base_key, i_train)
    loss = metrics["total_loss"]
    jax.block_until_ready(loss)
    total = float(np.asarray(loss.addressable_shards[0].data))
    assert np.isfinite(total), f"non-finite loss {total}"
    print(f"two_proc_dryrun: ok loss={total:.4f} "
          f"(proc {proc_id}, {n_local} local / {n_dev} global devices)",
          flush=True)


def parent() -> int:
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--proc", str(i), "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs) and \
        all("two_proc_dryrun: ok" in o for o in outs)
    for i, o in enumerate(outs):
        tail = "\n".join(o.strip().splitlines()[-3:])
        print(f"--- proc {i} ---\n{tail}")
    print("two_proc_dryrun PARENT:", "ok" if ok else "FAILED")
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    ns = ap.parse_args()
    if ns.proc is None:
        return parent()
    child(ns.proc, ns.port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
