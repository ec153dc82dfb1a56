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
