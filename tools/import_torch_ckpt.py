"""Convert a reference DM-NeRF torch checkpoint (.tar) to an orbax ckpt_N.

The reference saves {iteration, network_coarse_state_dict,
network_fine_state_dict, optimizer_state_dict} every i_save steps
(/root/reference/train_dmsr.py:78-86) and its test entries load that .tar
(/root/reference/test_dmsr.py:89-94). This tool lets a reference user bring
a trained model here without retraining:

  python tools/import_torch_ckpt.py --ckpt path/to/200000.tar \
      --config configs/dmsr/train/study.txt [--out logs/.../release]

writes `<out>/ckpt_200000` loadable by every `dmnerf_tpu.cli.test` mode
(--render / --mani_eval / --mani_demo / --mesh) and by `cli.train --resume`.
--out defaults to the config's log dir (basedir/expname/log_time), i.e. the
converted checkpoint lands exactly where the CLIs look for it.

Weight mapping (torch nn.Linear stores [out,in]; our layers store
w:[fan_in,fan_out], b:[fan_out] — models/fields.py:init_field_params):
  mlps.{i}.*              -> trunk[i]     (transposed)
  density_linear.*        -> density
  rgb_feature_linear.*    -> rgb_feat
  rgb_feature_linears.0.* -> rgb_hidden
  rgb_linear.*            -> rgb_out
  ins_feature_linear.*    -> ins_feat
  ins_feature_linears.0.* -> ins_hidden
  ins_linear.*            -> ins_out

The optimizer state is RE-INITIALIZED (fresh Adam moments at the checkpoint's
lr-schedule position): torch Adam moments are keyed by parameter position in
the reference's grad_vars list and importing them buys nothing for the test
entries, which never touch opt_state. `--resume` from an imported checkpoint
therefore continues the lr schedule exactly but warms Adam's m/v from zero
over its first ~1k steps — documented in docs/MIGRATION.md.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def state_dict_to_params(sd, cfg):
    """Map one reference DM_NeRF state_dict to our param pytree (f32)."""

    def layer(prefix):
        w = np.asarray(sd[f"{prefix}.weight"], dtype=np.float32).T.copy()
        b = np.asarray(sd[f"{prefix}.bias"], dtype=np.float32).copy()
        return {"w": w, "b": b}

    n_trunk = len([k for k in sd if k.startswith("mlps.")]) // 2
    if n_trunk != cfg.netdepth:
        raise ValueError(f"checkpoint has {n_trunk} trunk layers, config "
                         f"says netdepth={cfg.netdepth}")
    params = {
        "trunk": [layer(f"mlps.{i}") for i in range(cfg.netdepth)],
        "density": layer("density_linear"),
        "rgb_feat": layer("rgb_feature_linear"),
        "rgb_hidden": layer("rgb_feature_linears.0"),
        "rgb_out": layer("rgb_linear"),
        "ins_feat": layer("ins_feature_linear"),
        "ins_hidden": layer("ins_feature_linears.0"),
        "ins_out": layer("ins_linear"),
    }
    # shape validation against the config (catches netwidth/multires/ins_num
    # mismatches before they become silent garbage renders)
    checks = [
        ("trunk[0].w", params["trunk"][0]["w"].shape, (cfg.pos_ch, cfg.netwidth)),
        ("rgb_hidden.w", params["rgb_hidden"]["w"].shape,
         (cfg.netwidth + cfg.view_ch, cfg.netwidth // 2)),
        ("ins_out.w", params["ins_out"]["w"].shape,
         (cfg.netwidth // 2, cfg.ins_num + 1)),
    ]
    for name, got, want in checks:
        if got != want:
            raise ValueError(
                f"checkpoint/config mismatch at {name}: checkpoint has {got}, "
                f"config implies {want} (netdepth={cfg.netdepth} netwidth="
                f"{cfg.netwidth} multires={cfg.multires}/{cfg.multires_views} "
                f"ins_num={cfg.ins_num})")
    return params


def import_checkpoint(ckpt_path, args, out_dir=None):
    """torch .tar -> orbax ckpt_N under out_dir. Returns the written path."""
    import torch

    import jax
    from dmnerf_tpu.config import log_dir
    from dmnerf_tpu.models.fields import FieldConfig
    from dmnerf_tpu.train.checkpoint import save_checkpoint
    from dmnerf_tpu.train.step import create_train_state

    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    missing = [k for k in ("iteration", "network_coarse_state_dict",
                           "network_fine_state_dict") if k not in blob]
    if missing:
        raise ValueError(f"{ckpt_path}: not a reference DM-NeRF checkpoint "
                         f"(missing {missing}; see train_dmsr.py:78-86)")
    if getattr(args, "ins_num", None) is None:
        # configs never carry ins_num (the CLIs read it off the dataset,
        # exactly like the reference's test entries) — infer it from the
        # checkpoint's own instance head so conversion needs no dataset
        args.ins_num = int(np.asarray(
            blob["network_fine_state_dict"]["ins_linear.bias"]).shape[0]) - 1
    cfg = FieldConfig.from_args(args)
    step = int(blob["iteration"])
    params = {
        "coarse": state_dict_to_params(blob["network_coarse_state_dict"], cfg),
        "fine": state_dict_to_params(blob["network_fine_state_dict"], cfg),
    }
    template = create_train_state(jax.random.PRNGKey(0), cfg, args.lrate,
                                  args.lrate_decay)
    state = template._replace(params=params,
                              step=np.int32(step))
    out = out_dir or log_dir(args)
    os.makedirs(out, exist_ok=True)
    return save_checkpoint(out, state, step)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Convert a reference DM-NeRF .tar checkpoint to orbax")
    ap.add_argument("--ckpt", required=True, help="reference {iter}.tar path")
    ap.add_argument("--config", required=True,
                    help="config file describing the model (netdepth/netwidth/"
                         "multires/ins_num must match the checkpoint)")
    ap.add_argument("--out", default=None,
                    help="output dir (default: the config's log dir, where "
                         "cli.test looks)")
    ap.add_argument("--cpu", action="store_true",
                    help="convert on the host CPU without touching the "
                         "accelerator (conversion is pure data movement; on "
                         "a single-tenant TPU this avoids contending with a "
                         "training job — JAX_PLATFORMS alone is not enough "
                         "because plugin backends can ignore it)")
    ns = ap.parse_args(argv)

    if ns.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from dmnerf_tpu.config import initial
    args = initial(["--config", ns.config])
    path = import_checkpoint(ns.ckpt, args, ns.out)
    print(f"wrote {path}")
    print(f"test it:  python -m dmnerf_tpu.cli.test --config {ns.config} "
          f"--render --test_model {os.path.basename(path)}")


if __name__ == "__main__":
    main()
