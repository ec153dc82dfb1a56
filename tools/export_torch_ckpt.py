"""Convert an orbax ckpt_N back to a reference DM-NeRF torch .tar.

Inverse of tools/import_torch_ckpt.py: a model trained here can be handed
back to the reference's test entries (/root/reference/test_dmsr.py:89-94),
which expect {iteration, network_coarse_state_dict, network_fine_state_dict,
optimizer_state_dict} (train_dmsr.py:78-86). The optimizer_state_dict is
written EMPTY ({}): the reference's test scripts never read it, and its Adam
moments are keyed by grad_vars list position, which an importer cannot
reconstruct meaningfully (mirror of the import-side note).

  python tools/export_torch_ckpt.py --config configs/stress/dmsr_quality.txt \
      [--ckpt logs/.../ckpt_200000] [--out /tmp/200000.tar]

--ckpt defaults to the latest ckpt_N in the config's log dir; --out to
`<ckpt dir>/<iteration>.tar` (the reference's naming).

Round-trip guarantee: export -> import_torch_ckpt -> params are bit-identical
f32 (tests/test_import_ckpt.py::test_export_import_roundtrip); the weight
mapping table lives in import_torch_ckpt.py's docstring.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def params_to_state_dict(field_params):
    """Map one field's param pytree to the reference DM_NeRF state_dict
    naming (torch nn.Linear stores [out, in]; ours store w:[in, out])."""
    import torch

    names = {
        "density": "density_linear",
        "rgb_feat": "rgb_feature_linear",
        "rgb_hidden": "rgb_feature_linears.0",
        "rgb_out": "rgb_linear",
        "ins_feat": "ins_feature_linear",
        "ins_hidden": "ins_feature_linears.0",
        "ins_out": "ins_linear",
    }
    sd = {}

    def put(prefix, layer):
        sd[f"{prefix}.weight"] = torch.from_numpy(
            np.asarray(layer["w"], dtype=np.float32).T.copy())
        sd[f"{prefix}.bias"] = torch.from_numpy(
            np.asarray(layer["b"], dtype=np.float32).copy())

    for i, layer in enumerate(field_params["trunk"]):
        put(f"mlps.{i}", layer)
    for ours, theirs in names.items():
        put(theirs, field_params[ours])
    return sd


def export_checkpoint(ckpt_path, args, out=None):
    """orbax ckpt_N -> reference-format .tar. Returns the written path."""
    import torch

    import jax
    from dmnerf_tpu.models.fields import FieldConfig
    from dmnerf_tpu.train.checkpoint import checkpoint_step, restore_checkpoint
    from dmnerf_tpu.train.step import create_train_state

    cfg = FieldConfig.from_args(args)
    template = create_train_state(jax.random.PRNGKey(0), cfg, args.lrate,
                                  args.lrate_decay)
    state = restore_checkpoint(ckpt_path, template)
    step = int(state.step) or checkpoint_step(ckpt_path)
    blob = {
        "iteration": step,
        "network_coarse_state_dict": params_to_state_dict(
            state.params["coarse"]),
        "network_fine_state_dict": params_to_state_dict(state.params["fine"]),
        "optimizer_state_dict": {},
    }
    out = out or os.path.join(os.path.dirname(os.path.abspath(ckpt_path)),
                              f"{step:06d}.tar")
    torch.save(blob, out)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Convert an orbax checkpoint to a reference DM-NeRF .tar")
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None,
                    help="ckpt_N dir (default: latest in the config's log dir)")
    ap.add_argument("--out", default=None,
                    help="output .tar (default: <ckpt dir>/<iter>.tar)")
    ap.add_argument("--cpu", action="store_true",
                    help="convert on the host CPU without touching the "
                         "accelerator (mirror of import_torch_ckpt --cpu)")
    ns = ap.parse_args(argv)

    if ns.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from dmnerf_tpu.config import initial, log_dir
    from dmnerf_tpu.train.checkpoint import latest_checkpoint

    args = initial(["--config", ns.config])
    if getattr(args, "ins_num", None) is None:
        # infer the instance-head width from the checkpoint itself, mirroring
        # import_torch_ckpt (conversion must not need the dataset on disk)
        import orbax.checkpoint as ocp
        ckpt = ns.ckpt or latest_checkpoint(log_dir(args))
        if ckpt is None:
            raise SystemExit(f"no ckpt_N under {log_dir(args)}")
        with ocp.PyTreeCheckpointer() as ckptr:
            raw = ckptr.restore(os.path.abspath(ckpt))
        args.ins_num = int(np.asarray(
            raw["params"]["fine"]["ins_out"]["b"]).shape[0]) - 1
        ns.ckpt = ckpt
    path = export_checkpoint(ns.ckpt, args, ns.out)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
