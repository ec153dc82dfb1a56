"""Full-CLI quality drill on the reference-format stress scenes.

Runs, per scene: cli.train -> cli.test --render -> (dmsr) --mani_eval and
--mesh, all through the real loaders/CLIs on the TPU, then prints a summary
table (and appends it to docs/REPRODUCE.md with --record).

  python tools/make_stress_scenes.py --out data/stress_scenes --device tpu
  python tools/stress_drill.py [--scenes dmsr,replica,scannet] [--record]
"""

import argparse
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = {
    "dmsr": "configs/stress/dmsr_stress.txt",
    "dmsr_quality": "configs/stress/dmsr_quality.txt",
    "replica": "configs/stress/replica_stress.txt",
    "replica64": "configs/stress/replica64_stress.txt",
    "scannet": "configs/stress/scannet_stress.txt",
}


def run(cmd, capture=False):
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=ROOT, capture_output=capture, text=capture)
    if r.returncode != 0:
        if capture:
            print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
        sys.exit(f"FAILED: {' '.join(cmd)}")
    return r.stdout if capture else None


def demo_ms_per_view(stdout):
    """Mean per-view wall time from manipulator_demo's '[DEMO i] x.xs' lines,
    excluding view 0 (compile)."""
    import re
    ts = [float(m.group(1)) for m in
          re.finditer(r"\[DEMO (?:\d+)\] ([\d.]+)s", stdout)]
    return 1e3 * float(np.mean(ts[1:])) if len(ts) > 1 else None


def results_table(ldir, prefix):
    import glob
    cands = sorted(glob.glob(os.path.join(ldir, prefix + "*", "**",
                                          "test_results.txt"),
                             recursive=True))
    if not cands:
        return None
    return np.loadtxt(cands[-1])[-1]  # mean row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="dmsr,replica,scannet")
    ap.add_argument("--record", action="store_true")
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--demo", action="store_true",
                    help="also run mani_demo rigid+deform on the dmsr scene")
    args = ap.parse_args()

    rows = []
    for scene in args.scenes.split(","):
        cfg = CFG[scene]
        kv = dict(l.split("=", 1) for l in open(os.path.join(ROOT, cfg))
                  if "=" in l)
        kv = {k.strip(): v.strip() for k, v in kv.items()}
        ldir = os.path.join(ROOT, "logs", kv["expname"], kv["log_time"])
        if not args.skip_train:
            run([sys.executable, "-u", "-m", "dmnerf_tpu.cli.train",
                 "--config", cfg])
        run([sys.executable, "-u", "-m", "dmnerf_tpu.cli.test",
             "--config", cfg, "--render"])
        render = results_table(ldir, "render_test_")
        mani = None
        demo_ms = {}
        if scene.startswith("dmsr"):
            run([sys.executable, "-u", "-m", "dmnerf_tpu.cli.test",
                 "--config", cfg, "--mani_eval"])
            mani = results_table(ldir, "mani_eval_")
            # mani_demo at reference scale (640x480 through the real CLI,
            # images only as the reference test_dmsr.py:48-59): rigid =
            # 1-object translation sequence; deform = MIXED sin-deform +
            # rigid pair (objs_info_deform.json from make_stress_scenes)
            if args.demo:
                for mt in ("rigid", "deform"):
                    out = run([sys.executable, "-u", "-m",
                               "dmnerf_tpu.cli.test", "--config", cfg,
                               "--mani_demo", "--mani_type", mt],
                              capture=True)
                    print(out[-1500:])
                    demo_ms[mt] = demo_ms_per_view(out)
            run([sys.executable, "-u", "-m", "dmnerf_tpu.cli.test",
                 "--config", cfg, "--mesh"])
        rows.append((scene, render, mani, demo_ms))

    lines = ["", "### Stress-scene drill results (reference formats, real CLIs)",
             "",
             "| scene | mode | PSNR | SSIM | AP50 | AP75 | AP90 | AP95 |",
             "|---|---|---|---|---|---|---|---|"]
    for scene, render, mani, demo_ms in rows:
        for mode, t in (("render", render), ("mani_eval", mani)):
            if t is None:
                continue
            lines.append(f"| {scene} | {mode} | {t[0]:.2f} | {t[1]:.4f} | "
                         f"{t[3]:.3f} | {t[4]:.3f} | {t[7]:.3f} | {t[8]:.3f} |")
        for mt, ms in demo_ms.items():
            if ms is not None:
                lines.append(f"| {scene} | mani_demo/{mt} | "
                             f"{ms:.0f} ms/view (no GT) | | | | | |")
    out = "\n".join(lines)
    print(out)
    if args.record:
        with open(os.path.join(ROOT, "docs", "REPRODUCE.md"), "a") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
