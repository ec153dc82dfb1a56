"""Config / flag system.

Reads the reference's ini-style ``.txt`` config files verbatim (the 43 files under
``configs/{dmsr,replica,scannet}/{train,test,mani}``) without depending on
configargparse. Flag inventory mirrors the reference parser
(/root/reference/config.py:9-123) plus TPU-native additions (precision, sharding,
resume, bench knobs).

File format accepted (configargparse ini subset):
  - ``key = value`` lines
  - bare ``flag`` lines (store_true)
  - ``#`` / ``;`` comments, blank lines
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time
from typing import Any, Dict, List, Optional


def _parse_config_file(path: str) -> Dict[str, str]:
    out: Dict[str, str] = {}
    with open(path, "r") as f:
        for raw in f:
            line = raw.split("#", 1)[0].split(";", 1)[0].strip()
            if not line:
                continue
            if "=" in line:
                k, v = line.split("=", 1)
                out[k.strip()] = v.strip()
            else:
                out[line] = "True"  # bare store_true flag
    return out


_TRUTHY = {"true", "1", "yes", "on"}


def _coerce(val: str, ty) -> Any:
    if ty is bool:
        return str(val).strip().lower() in _TRUTHY
    return ty(val)


@dataclasses.dataclass
class FlagSpec:
    name: str
    ty: type
    default: Any = None
    help: str = ""
    store_true: bool = False


# Mirrors /root/reference/config.py:9-123 (defaults included, dead flags kept for
# config-file compatibility), with TPU additions at the bottom.
FLAG_SPECS: List[FlagSpec] = [
    FlagSpec("config", str, None, "config file path"),
    FlagSpec("expname", str, "office_0", "experiment name"),
    FlagSpec("log_time", str, None, "log subdirectory (timestamp)"),
    FlagSpec("basedir", str, "./logs", "where to store ckpts and logs"),
    FlagSpec("datadir", str, "./data/replica/office_0", "input data directory"),
    # training options
    FlagSpec("netdepth", int, 8, "layers in network"),
    FlagSpec("netwidth", int, 256, "channels per layer"),
    FlagSpec("N_train", int, 4096, "rays per gradient step"),
    FlagSpec("lrate", float, 5e-4, "learning rate"),
    FlagSpec("lrate_decay", int, 500, "exp lr decay (in 1000 steps)"),
    FlagSpec("N_test", int, 2048, "rays per eval chunk"),
    FlagSpec("is_train", bool, True, "train or test"),
    # rendering options
    FlagSpec("N_samples", int, 64, "coarse samples per ray"),
    FlagSpec("N_importance", int, 128, "fine importance samples per ray"),
    FlagSpec("perturb", float, 1.0, "0 = no stratified jitter, 1 = jitter"),
    FlagSpec("i_embed", int, 0, "0 = positional encoding, -1 = identity"),
    FlagSpec("multires", int, 10, "PE octaves for 3D position"),
    FlagSpec("multires_views", int, 4, "PE octaves for view direction"),
    FlagSpec("render", bool, False, "reload weights and render test poses", store_true=True),
    FlagSpec("test_model", str, "000000.tar", "checkpoint file to test"),
    # dataset options
    FlagSpec("testskip", int, 10, "load 1/N test images"),
    FlagSpec("resize", bool, False, "resize ScanNet images to 640x480", store_true=True),
    FlagSpec("near", float, None, "nearest depth"),
    FlagSpec("far", float, None, "farthest depth"),
    FlagSpec("crop_width", int, None, "crop width (ScanNet)"),
    FlagSpec("crop_height", int, None, "crop height (ScanNet)"),
    # logging/saving
    FlagSpec("i_print", int, 100, "console print frequency"),
    FlagSpec("i_img", int, 500, "(dead flag kept for compat)"),
    FlagSpec("i_save", int, 10000, "ckpt save frequency"),
    FlagSpec("i_test", int, 50000, "in-training testset frequency"),
    FlagSpec("eval_views", int, 10, "test views per in-training eval (10 "
             "random, reference train_dmsr.py:92; >= the test-split size "
             "evaluates ALL test views in order — a fixed set gives "
             "noise-free quality curves)"),
    # instance / penalizer options
    FlagSpec("penalize", bool, False, "penalize unlabeled rays toward air", store_true=True),
    FlagSpec("tolerance", float, None, "gaussian center offset from depth"),
    FlagSpec("deta_w", float, None, "gaussian width"),
    # manipulation
    FlagSpec("target_label", int, None, "instance id to manipulate"),
    FlagSpec("center_index", int, None, "(dead flag kept for compat)"),
    FlagSpec("ori_pose", int, None, "(dead flag kept for compat)"),
    FlagSpec("mani_demo", bool, False, "run manipulation demo", store_true=True),
    FlagSpec("mani_eval", bool, False, "run manipulation eval vs GT", store_true=True),
    FlagSpec("mani_mode", str, "rotation", "translation|rotation|scale|multi"),
    FlagSpec("mani_type", str, "rigid", "rigid|deform"),
    FlagSpec("views", int, 720, "number of generated demo views"),
    FlagSpec("translation", bool, False, "(dead flag kept for compat)"),
    FlagSpec("rotation", bool, False, "(dead flag kept for compat)"),
    FlagSpec("scale", bool, False, "(dead flag kept for compat)"),
    # meshing
    FlagSpec("mesh", bool, False, "extract 3D colored mesh", store_true=True),
    # ---- TPU-native additions (not in reference) ----
    FlagSpec("precision", str, "bf16", "matmul compute dtype: bf16|f32"),
    FlagSpec("seed", int, 0, "PRNG seed"),
    FlagSpec("n_iters", int, 500000, "training iterations (reference: 500k)"),
    FlagSpec("data_devices", int, 0, "0 = all local devices; else mesh size"),
    FlagSpec("resume", bool, False, "resume training from latest checkpoint", store_true=True),
    FlagSpec("use_pallas", bool, True, "use the fused Pallas field kernel on eval/render paths (measured 1.4x the XLA path on v5e; --use_pallas False for the XLA path)"),
    FlagSpec("pallas_train", bool, True, "use the fused Pallas fwd+bwd field kernel in training (measured 40 vs 54 ms/step on v5e; --pallas_train False for the XLA path)"),
    FlagSpec("scan_steps", int, 0, "training steps per device dispatch (lax.scan); 0 = auto (largest divisor of the print/save/eval cadences <= 100)"),
    FlagSpec("profile_steps", int, 0, "capture a jax.profiler trace of this many training dispatches into {logdir}/profile (0 = off)"),
    FlagSpec("remat", bool, False, "rematerialize MLP activations in backward "
             "(profiled slower than storing bf16 activations at reference batch sizes)"),
    FlagSpec("lpips_weights", str, None, "path to LPIPS-VGG weights (.npz); metric gated if absent"),
    FlagSpec("d2h_pack", bool, False, "pack eval/edit outputs on device (rgb uint8, "
             "conf/depth bf16) before the device->host fetch: 3x fewer tunnel bytes; "
             "metrics then see 8-bit rgb (pngs identical)", store_true=True),
    FlagSpec("debug_nans", bool, False, "enable jax debug_nans (the reference keeps "
             "torch's anomaly detector ALWAYS on, dm_nerf.py:5 — a perf bug; here it's opt-in)",
             store_true=True),
    FlagSpec("resolve_target_label", bool, False, "treat --target_label as a GT "
             "instance label and resolve it to the trained model's instance "
             "CHANNEL by Hungarian-matching rendered test views (the Hungarian "
             "loss leaves channel<->object binding arbitrary; the reference's "
             "configs hardcode per-checkpoint channel ids)", store_true=True),
    FlagSpec("init_scheme", str, "he", "field weight init: he (dead-seed-safe default) | torch (reference's exact nn.Linear distribution, for parity experiments)"),
    FlagSpec("mesh_grid_dim", int, 256, "marching-cubes grid resolution"),
    FlagSpec("mesh_extents", str, "1.9,7.0,7.0", "scene extents for meshing"),
    FlagSpec("mesh_level", float, 0.45, "marching-cubes iso level"),
]


class Config(argparse.Namespace):
    """Namespace with attribute access; also carries computed state the loaders
    and loops attach (ins_num, N_ins, target_labels) like the reference does."""

    # computed, attached later:
    ins_num: Optional[int] = None
    N_ins: Optional[int] = None
    target_labels: Optional[list] = None

    def replace(self, **kw) -> "Config":
        new = Config(**vars(self))
        for k, v in kw.items():
            setattr(new, k, v)
        return new


def config_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="dmnerf_tpu")
    for spec in FLAG_SPECS:
        if spec.ty is bool:
            # accept both `--flag` and `--flag True/False`
            parser.add_argument(
                f"--{spec.name}", nargs="?", const="True",
                default=None, help=spec.help)
        else:
            parser.add_argument(f"--{spec.name}", type=str, default=None, help=spec.help)
    return parser


def parse_args(argv: Optional[List[str]] = None) -> Config:
    """Parse CLI args + config file. Precedence: CLI > config file > defaults
    (same as configargparse)."""
    parser = config_parser()
    ns, _unknown = parser.parse_known_args(argv)

    file_vals: Dict[str, str] = {}
    if ns.config:
        file_vals = _parse_config_file(ns.config)
        # warn-but-continue on unknown config keys (configargparse-compatible
        # tolerance) — silently dropping them hides real bugs: the reference
        # ships a '1expname' typo (replica room_1 silently trains under the
        # default expname) and stale editor_*/over_penalize names (bathroom
        # mani flags silently off). See PARITY.md.
        known = {s.name for s in FLAG_SPECS}
        unknown = [k for k in file_vals if k not in known]
        if unknown:
            import sys as _sys
            print(f"config: ignoring unknown keys in {ns.config}: "
                  f"{', '.join(sorted(unknown))}", file=_sys.stderr)

    cfg = Config()
    for spec in FLAG_SPECS:
        cli_val = getattr(ns, spec.name, None)
        if cli_val is not None:
            val = _coerce(cli_val, spec.ty)
        elif spec.name in file_vals:
            val = _coerce(file_vals[spec.name], spec.ty)
        else:
            val = spec.default
        setattr(cfg, spec.name, val)
    cfg.ins_num = None
    cfg.N_ins = None
    cfg.target_labels = None
    return cfg


def default_config(**overrides) -> Config:
    """Config with all defaults (for tests / library use)."""
    cfg = Config()
    for spec in FLAG_SPECS:
        setattr(cfg, spec.name, spec.default)
    cfg.ins_num = None
    cfg.N_ins = None
    cfg.target_labels = None
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


def initial(argv: Optional[List[str]] = None) -> Config:
    """Parse flags, create the run's log dir and dump provenance
    (mirrors /root/reference/config.py:141-167, minus the torch device setup)."""
    cfg = parse_args(argv)
    if cfg.log_time is None:
        cfg.log_time = time.strftime("%Y%m%d%H%M", time.localtime())
    log_dir = os.path.join(cfg.basedir, cfg.expname, cfg.log_time)
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "args.txt"), "w") as f:
        for k in sorted(vars(cfg)):
            f.write(f"{k} = {getattr(cfg, k)}\n")
    if cfg.config is not None and os.path.exists(cfg.config):
        with open(os.path.join(log_dir, "configs.txt"), "w") as f:
            f.write(open(cfg.config, "r").read())
    print("Logs in", log_dir)
    return cfg


def log_dir(cfg: Config) -> str:
    return os.path.join(cfg.basedir, cfg.expname, cfg.log_time)
