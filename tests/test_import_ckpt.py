"""tools/import_torch_ckpt: reference .tar -> orbax conversion.

Fast lane (no reference import): builds a reference-format checkpoint blob
directly (the exact key schema torch.save'd by train_dmsr.py:78-86 /
loaded by test_dmsr.py:89-94), converts it, restores through the SAME
path cli.test uses, and asserts bit-exactness. The full render A/B through
a converted checkpoint (surface-15 flavor) lives in test_reference_oracle.py.
"""

import os
import sys

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from import_torch_ckpt import import_checkpoint, state_dict_to_params  # noqa: E402

from dmnerf_tpu.config import default_config  # noqa: E402
from dmnerf_tpu.models.fields import FieldConfig, init_field_params  # noqa: E402
from dmnerf_tpu.train.checkpoint import (checkpoint_step,  # noqa: E402
                                         restore_checkpoint)
from dmnerf_tpu.train.step import create_train_state  # noqa: E402


def _args(**kw):
    base = dict(netdepth=4, netwidth=64, multires=6, multires_views=2,
                lrate=5e-4, lrate_decay=500)
    base.update(kw)
    a = default_config(**base)
    a.ins_num = 6
    return a


def _state_dict_from_params(params, cfg):
    """Write our pytree as the reference DM_NeRF state_dict (torch [out,in])."""
    sd = {}

    def put(prefix, layer):
        sd[f"{prefix}.weight"] = torch.from_numpy(
            np.asarray(layer["w"]).T.copy())
        sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(layer["b"]).copy())

    for i, layer in enumerate(params["trunk"]):
        put(f"mlps.{i}", layer)
    put("density_linear", params["density"])
    put("rgb_feature_linear", params["rgb_feat"])
    put("rgb_feature_linears.0", params["rgb_hidden"])
    put("rgb_linear", params["rgb_out"])
    put("ins_feature_linear", params["ins_feat"])
    put("ins_feature_linears.0", params["ins_hidden"])
    put("ins_linear", params["ins_out"])
    return sd


def _write_ref_ckpt(path, params, cfg, iteration):
    torch.save({
        "iteration": iteration,
        "network_coarse_state_dict":
            _state_dict_from_params(params["coarse"], cfg),
        "network_fine_state_dict":
            _state_dict_from_params(params["fine"], cfg),
        "optimizer_state_dict": {},
    }, path)


@pytest.mark.slow
def test_roundtrip_bit_exact(tmp_path):
    """tar -> ckpt_N -> restore == original params, step preserved."""
    args = _args()
    cfg = FieldConfig.from_args(args)
    kc, kf = jax.random.split(jax.random.PRNGKey(3))
    params = {"coarse": init_field_params(kc, cfg, scheme="torch"),
              "fine": init_field_params(kf, cfg, scheme="torch")}
    tar = tmp_path / "200000.tar"
    _write_ref_ckpt(str(tar), params, cfg, 200000)

    out = import_checkpoint(str(tar), args, out_dir=str(tmp_path / "logs"))
    assert os.path.basename(out) == "ckpt_200000"
    assert checkpoint_step(out) == 200000

    template = create_train_state(jax.random.PRNGKey(0), cfg, args.lrate,
                                  args.lrate_decay)
    state = restore_checkpoint(out, template)
    assert int(state.step) == 200000
    flat_o, _ = jax.tree_util.tree_flatten(params)
    flat_r, _ = jax.tree_util.tree_flatten(state.params)
    for o, r in zip(flat_o, flat_r):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r))


@pytest.mark.slow
def test_export_import_roundtrip(tmp_path):
    """tools/export_torch_ckpt: ckpt_N -> reference .tar -> ckpt_N is
    bit-identical f32 (both conversion directions share one mapping table,
    import_torch_ckpt.py docstring)."""
    from export_torch_ckpt import export_checkpoint

    from dmnerf_tpu.train.checkpoint import save_checkpoint

    args = _args()
    cfg = FieldConfig.from_args(args)
    kc, kf = jax.random.split(jax.random.PRNGKey(7))
    params = {"coarse": init_field_params(kc, cfg, scheme="torch"),
              "fine": init_field_params(kf, cfg, scheme="torch")}
    template = create_train_state(jax.random.PRNGKey(0), cfg, args.lrate,
                                  args.lrate_decay)
    state = template._replace(params=params, step=np.int32(123000))
    src = save_checkpoint(str(tmp_path / "a"), state, 123000)

    tar = export_checkpoint(src, args, out=str(tmp_path / "123000.tar"))
    blob = torch.load(tar, map_location="cpu", weights_only=False)
    assert blob["iteration"] == 123000
    assert blob["optimizer_state_dict"] == {}

    back = import_checkpoint(tar, args, out_dir=str(tmp_path / "b"))
    restored = restore_checkpoint(back, template)
    assert int(restored.step) == 123000
    flat_o, _ = jax.tree_util.tree_flatten(params)
    flat_r, _ = jax.tree_util.tree_flatten(restored.params)
    for o, r in zip(flat_o, flat_r):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r))


def test_mismatched_config_rejected(tmp_path):
    """netwidth / ins_num / netdepth mismatches fail loudly, not silently."""
    args = _args()
    cfg = FieldConfig.from_args(args)
    kc, kf = jax.random.split(jax.random.PRNGKey(4))
    params = {"coarse": init_field_params(kc, cfg, scheme="torch"),
              "fine": init_field_params(kf, cfg, scheme="torch")}
    tar = tmp_path / "10000.tar"
    _write_ref_ckpt(str(tar), params, cfg, 10000)

    for bad in (dict(netwidth=128), dict(multires=10), dict(netdepth=8)):
        with pytest.raises(ValueError, match="mismatch|trunk"):
            import_checkpoint(str(tar), _args(**bad),
                              out_dir=str(tmp_path / "x"))
    bad_args = _args()
    bad_args.ins_num = 9
    with pytest.raises(ValueError, match="mismatch"):
        import_checkpoint(str(tar), bad_args, out_dir=str(tmp_path / "y"))


def test_non_reference_blob_rejected(tmp_path):
    p = tmp_path / "junk.tar"
    torch.save({"weights": 1}, str(p))
    with pytest.raises(ValueError, match="not a reference"):
        import_checkpoint(str(p), _args(), out_dir=str(tmp_path / "z"))


def test_cli_infers_ins_num(tmp_path):
    """The CLI path works with a real config file: configs never carry
    ins_num (the CLIs read it off the dataset), so the tool must infer it
    from the checkpoint's instance head rather than crash on None."""
    from import_torch_ckpt import main as import_main

    args = _args()
    cfg = FieldConfig.from_args(args)
    kc, kf = jax.random.split(jax.random.PRNGKey(6))
    params = {"coarse": init_field_params(kc, cfg, scheme="torch"),
              "fine": init_field_params(kf, cfg, scheme="torch")}
    tar = tmp_path / "050000.tar"
    _write_ref_ckpt(str(tar), params, cfg, 50000)

    cfg_file = tmp_path / "scene.txt"
    cfg_file.write_text(
        "expname = imp\nbasedir = ./logs\ndatadir = ./data/x\n"
        "netdepth = 4\nnetwidth = 64\nmultires = 6\nmultires_views = 2\n"
        "lrate = 5e-4\nlrate_decay = 500\n")
    out = tmp_path / "logs"
    import_main(["--ckpt", str(tar), "--config", str(cfg_file),
                 "--out", str(out)])
    restored = restore_checkpoint(
        str(out / "ckpt_050000") if (out / "ckpt_050000").exists()
        else str(out / "ckpt_50000"),
        create_train_state(jax.random.PRNGKey(0), cfg, args.lrate,
                           args.lrate_decay))
    assert int(restored.step) == 50000
    np.testing.assert_array_equal(
        np.asarray(restored.params["fine"]["ins_out"]["b"]),
        np.asarray(params["fine"]["ins_out"]["b"]))


def test_state_dict_mapping_shapes():
    """Every mapped layer transposes: torch [out,in] -> ours [in,out]."""
    args = _args()
    cfg = FieldConfig.from_args(args)
    params = init_field_params(jax.random.PRNGKey(5), cfg, scheme="torch")
    sd = _state_dict_from_params(params, cfg)
    back = state_dict_to_params(sd, cfg)
    flat_o, tdef_o = jax.tree_util.tree_flatten(params)
    flat_b, tdef_b = jax.tree_util.tree_flatten(back)
    assert tdef_o == tdef_b
    for o, b in zip(flat_o, flat_b):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(b))


@pytest.mark.slow
def test_cli_mains_cpu_flag(tmp_path, capsys):
    """Both converter CLIs accept --cpu (force host platform before the
    backend initializes; plugin backends ignore JAX_PLATFORMS) and
    round-trip through their argparse mains."""
    import import_torch_ckpt as imp_cli
    from export_torch_ckpt import main as exp_main

    args = _args()
    cfg = FieldConfig.from_args(args)
    kc, kf = jax.random.split(jax.random.PRNGKey(11))
    params = {"coarse": init_field_params(kc, cfg, scheme="torch"),
              "fine": init_field_params(kf, cfg, scheme="torch")}
    tar = tmp_path / "007000.tar"
    _write_ref_ckpt(str(tar), params, cfg, 7000)

    cfg_txt = tmp_path / "model.txt"
    cfg_txt.write_text(
        "expname = imp_cli\n"
        f"basedir = {tmp_path}/logs\n"
        f"datadir = {tmp_path}/nodata\n"
        "netdepth = 4\nnetwidth = 64\nmultires = 6\nmultires_views = 2\n"
        "lrate = 5e-4\nlrate_decay = 500\nlog_time = t\n")

    imp_cli.main(["--ckpt", str(tar), "--config", str(cfg_txt),
                  "--out", str(tmp_path / "o"), "--cpu"])
    out = capsys.readouterr().out
    assert "ckpt_007000" in out
    exp_main(["--config", str(cfg_txt), "--ckpt",
              str(tmp_path / "o" / "ckpt_007000"),
              "--out", str(tmp_path / "back.tar"), "--cpu"])
    blob = torch.load(tmp_path / "back.tar", map_location="cpu",
                      weights_only=False)
    assert blob["iteration"] == 7000
    sd = _state_dict_from_params(params["fine"], cfg)
    for k, v in blob["network_fine_state_dict"].items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(sd[k]))
