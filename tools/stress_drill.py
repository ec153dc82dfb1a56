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
    "replica": "configs/stress/replica_stress.txt",
    "replica64": "configs/stress/replica64_stress.txt",
    "scannet": "configs/stress/scannet_stress.txt",
}


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=ROOT)
    if r.returncode != 0:
        sys.exit(f"FAILED: {' '.join(cmd)}")


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
    args = ap.parse_args()

    rows = []
    for scene in args.scenes.split(","):
        cfg = CFG[scene]
        ldir = os.path.join(ROOT, "logs", f"{scene}_stress", "drill")
        if not args.skip_train:
            run([sys.executable, "-u", "-m", "dmnerf_tpu.cli.train",
                 "--config", cfg])
        run([sys.executable, "-u", "-m", "dmnerf_tpu.cli.test",
             "--config", cfg, "--render"])
        render = results_table(ldir, "render_test_")
        mani = None
        if scene == "dmsr":
            run([sys.executable, "-u", "-m", "dmnerf_tpu.cli.test",
                 "--config", cfg, "--mani_eval"])
            mani = results_table(ldir, "mani_eval_")
            run([sys.executable, "-u", "-m", "dmnerf_tpu.cli.test",
                 "--config", cfg, "--mesh"])
        rows.append((scene, render, mani))

    lines = ["", "### Stress-scene drill results (reference formats, real CLIs)",
             "",
             "| scene | mode | PSNR | SSIM | AP50 | AP75 | AP90 | AP95 |",
             "|---|---|---|---|---|---|---|---|"]
    for scene, render, mani in rows:
        for mode, t in (("render", render), ("mani_eval", mani)):
            if t is None:
                continue
            lines.append(f"| {scene} | {mode} | {t[0]:.2f} | {t[1]:.4f} | "
                         f"{t[3]:.3f} | {t[4]:.3f} | {t[7]:.3f} | {t[8]:.3f} |")
    out = "\n".join(lines)
    print(out)
    if args.record:
        with open(os.path.join(ROOT, "docs", "REPRODUCE.md"), "a") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
