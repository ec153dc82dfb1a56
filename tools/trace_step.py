"""Capture a jax.profiler trace of the deployed 50-step train scan and print
per-op device time, aggregated by HLO op category and by individual op name.

Parses the Perfetto trace.json.gz the profiler writes (no tensorflow needed).
Usage:  python tools/trace_step.py [--top 40] [--out /tmp/step_trace]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmnerf_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def capture(out_dir):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tools.bench_step_anatomy import make_args, scene_arrays, SCAN
    from dmnerf_tpu.models.fields import FieldConfig
    from dmnerf_tpu.train.step import create_train_state, make_train_scan_step

    args = make_args()
    scene = scene_arrays()
    args.ins_num = 32
    cfg = FieldConfig.from_args(args)
    arrs = scene.to_device_arrays()
    i_train = jnp.asarray(np.asarray(scene.i_train), jnp.int32)
    base_key = jax.random.PRNGKey(1)
    state = create_train_state(jax.random.PRNGKey(0), cfg,
                               args.lrate, args.lrate_decay)
    step_fn = make_train_scan_step(args, cfg, scan_steps=SCAN)

    # warm (compile) outside the trace
    state, m = step_fn(state, arrs, base_key, i_train)
    jax.block_until_ready(m["total_loss"])
    with jax.profiler.trace(out_dir):
        state, m = step_fn(state, arrs, base_key, i_train)
        jax.block_until_ready(m["total_loss"])
    print("trace captured to", out_dir, flush=True)


def categorize(name: str) -> str:
    n = name.lower()
    for key in ("fused_field_fwd", "fused_field_bwd", "render_field",
                "custom-call"):
        if key in n:
            return "pallas/" + key
    for key in ("pad", "copy", "transpose", "fusion", "convert", "reshape",
                "dot", "dynamic-slice", "dynamic-update-slice", "scatter",
                "gather", "sort", "while", "concatenate", "broadcast",
                "reduce", "iota", "select", "bitcast", "slice", "rng",
                "all-reduce", "tuple", "cumsum", "exp", "log"):
        if n.startswith(key) or ("%" + key) in n or ("." + key) in n:
            return key
    return "other"


def parse(out_dir, top):
    files = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        sys.exit(f"no trace.json.gz under {out_dir}")
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU / device
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "tpu" in n.lower() or "device" in n.lower()
                or "/device" in n.lower()}
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_name[name] += dur
        total += dur
    by_cat = defaultdict(float)
    for name, ms in by_name.items():
        by_cat[categorize(name)] += ms
    print(f"\ndevice total {total:.1f} ms over the {os.path.basename(path)} "
          f"trace ({total / 50:.2f} ms/step if 50-step scan)\n")
    print("== by category (ms, ms/step) ==")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:28s} {ms:9.2f}  {ms / 50:7.3f}")
    print(f"\n== top {top} ops ==")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:9.2f}  {ms / 50:7.3f}  {name[:110]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/step_trace")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--parse_only", action="store_true")
    a = p.parse_args()
    if not a.parse_only:
        capture(a.out)
    parse(a.out, a.top)


if __name__ == "__main__":
    main()
