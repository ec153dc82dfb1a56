"""The DM-NeRF field: an MLP producing (rgb, density, instance logits) per point.

Architecture parity (/root/reference/networks/dm_nerf.py:58-106):
- trunk: D=8 layers of width W=256, ReLU, skip-concat of the encoded position
  after layer index 4 (so layer 5 consumes W + input_ch_pts).
- density head: Linear(W -> 1) on the trunk feature.
- rgb head: Linear(W -> W) [no activation], concat encoded viewdirs,
  Linear(W+view_ch -> W/2) + ReLU, Linear(W/2 -> 3).
- instance head: **stop_gradient on the trunk feature** (dm_nerf.py:95), then
  Linear(W -> W) [no activation], Linear(W -> W/2) + ReLU,
  Linear(W/2 -> ins_num + 1)  (last channel = "air"/background).
- output: concat([rgb(3), density(1), ins(K+1)]).

TPU design: parameters are a plain pytree of jnp arrays (fp32 masters); apply_field
is a pure function whose matmuls run in a configurable compute dtype (bf16 on the
MXU by default, fp32 accumulation via preferred_element_type). Points are a flat
[P, ...] batch so XLA tiles the [P, W] x [W, W] matmuls straight onto the MXU.
Initialization defaults to He-uniform kernels (see _linear_init for why the
reference's torch-default init is a dead-seed hazard); `scheme="torch"` gives the
reference's exact distribution for parity experiments.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from dmnerf_tpu.core.encoding import encoding_dim, positional_encoding

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    netdepth: int = 8
    netwidth: int = 256
    multires: int = 10        # PE octaves for positions (-> 63 ch)
    multires_views: int = 4   # PE octaves for view dirs (-> 27 ch)
    skip: int = 4             # skip-concat after this trunk layer index
    ins_num: int = 32         # number of object slots (output has ins_num+1)
    compute_dtype: Any = jnp.bfloat16

    @property
    def pos_ch(self) -> int:
        return encoding_dim(self.multires)

    @property
    def view_ch(self) -> int:
        return encoding_dim(self.multires_views)

    @staticmethod
    def from_args(args) -> "FieldConfig":
        dt = jnp.bfloat16 if getattr(args, "precision", "bf16") == "bf16" else jnp.float32
        return FieldConfig(
            netdepth=args.netdepth, netwidth=args.netwidth,
            multires=args.multires, multires_views=args.multires_views,
            ins_num=args.ins_num, compute_dtype=dt,
        )


def field_output_dim(cfg: FieldConfig) -> int:
    return 3 + 1 + cfg.ins_num + 1


def _linear_init(key: jax.Array, fan_in: int, fan_out: int, scheme: str = "he"):
    """Layer init.

    scheme="he" (default): He-uniform kernel (U(+-sqrt(6/fan_in))) + torch-style
    uniform bias. The reference uses torch nn.Linear defaults
    (U(+-1/sqrt(fan_in)) for both), under which activations of the 8-deep ReLU
    trunk collapse to the bias scale and the density pre-activation becomes a
    near-constant whose sign is a coin flip of one bias draw — a negative draw
    gives relu'(sigma)=0 everywhere and a dead render head. He scaling keeps
    ReLU variance constant through depth, removing the dead-seed failure mode
    while matching the reference's distributions in expectation shape.
    scheme="torch": exact torch default (for parity experiments).
    """
    if scheme == "he":
        wbound = jnp.sqrt(6.0 / fan_in)
    else:
        wbound = 1.0 / jnp.sqrt(fan_in)
    bbound = 1.0 / jnp.sqrt(fan_in)
    kk, kb = jax.random.split(key)
    w = jax.random.uniform(kk, (fan_in, fan_out), jnp.float32, -wbound, wbound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bbound, bbound)
    return {"w": w, "b": b}


def init_field_params(key: jax.Array, cfg: FieldConfig, scheme: str = "he") -> Params:
    D, W = cfg.netdepth, cfg.netwidth
    # skip == D-1 would concat pos features AFTER the last trunk layer, feeding
    # the heads W+pos_ch where they expect W (the reference's DM_NeRF breaks
    # identically). skip >= D simply never fires (tiny test configs rely on
    # the default skip=4 being out of range at netdepth=2).
    if cfg.skip == D - 1:
        raise ValueError(
            f"skip ({cfg.skip}) == netdepth-1: the skip concat would land "
            f"after the final trunk layer; use skip < netdepth-1 (or >= "
            f"netdepth to disable)")
    pos_ch, view_ch = cfg.pos_ch, cfg.view_ch
    keys = iter(jax.random.split(key, D + 8))
    trunk = []
    in_dim = pos_ch
    for i in range(D):
        trunk.append(_linear_init(next(keys), in_dim, W, scheme))
        # layer (i+1) consumes W + pos_ch if the skip concat happened after layer i
        in_dim = W + pos_ch if i == cfg.skip else W
    return {
        "trunk": trunk,
        "density": _linear_init(next(keys), W, 1, scheme),
        "rgb_feat": _linear_init(next(keys), W, W, scheme),
        "rgb_hidden": _linear_init(next(keys), W + view_ch, W // 2, scheme),
        "rgb_out": _linear_init(next(keys), W // 2, 3, scheme),
        "ins_feat": _linear_init(next(keys), W, W, scheme),
        "ins_hidden": _linear_init(next(keys), W, W // 2, scheme),
        "ins_out": _linear_init(next(keys), W // 2, cfg.ins_num + 1, scheme),
    }


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def _dot(x: jnp.ndarray, layer: Params, dtype, out_dtype=None) -> jnp.ndarray:
    """Linear layer in compute dtype with fp32 accumulation on the MXU.

    out_dtype controls the dtype of the STORED result: the step is HBM-bound on
    inter-layer activations (measured: bf16 and f32 matmuls take the same wall
    clock), so trunk activations are kept in the compute dtype to halve the
    traffic; heads return fp32.
    """
    y = jnp.dot(x.astype(dtype), layer["w"].astype(dtype),
                preferred_element_type=jnp.promote_types(jnp.float32, dtype))
    y = y + layer["b"]
    return y.astype(out_dtype) if out_dtype is not None else y


def apply_field(params: Params, cfg: FieldConfig,
                pts: jnp.ndarray, viewdirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the field at raw 3D points with unit view directions.

    pts: [..., 3], viewdirs: [..., 3] (broadcastable to pts).
    Returns raw [..., 4 + ins_num + 1] in fp32: [rgb_logits, sigma, ins_logits].
    Encoding happens inside so callers never materialize encoded features.
    """
    dt = cfg.compute_dtype
    x = positional_encoding(pts, cfg.multires)
    d = positional_encoding(jnp.broadcast_to(viewdirs, pts.shape), cfg.multires_views)

    h = x.astype(dt)
    x_dt = h
    for i, layer in enumerate(params["trunk"]):
        h = jax.nn.relu(_dot(h, layer, dt, out_dtype=dt))
        if i == cfg.skip:
            h = jnp.concatenate([h, x_dt], axis=-1)

    density = _dot(h, params["density"], dt)

    rgb_f = _dot(h, params["rgb_feat"], dt, out_dtype=dt)
    rgb_f = jnp.concatenate([rgb_f, d.astype(dt)], axis=-1)
    rgb_f = jax.nn.relu(_dot(rgb_f, params["rgb_hidden"], dt, out_dtype=dt))
    rgb = _dot(rgb_f, params["rgb_out"], dt)

    # instance branch reads the trunk through stop_gradient (dm_nerf.py:95)
    ins_f = jax.lax.stop_gradient(h)
    ins_f = _dot(ins_f, params["ins_feat"], dt, out_dtype=dt)
    ins_f = jax.nn.relu(_dot(ins_f, params["ins_hidden"], dt, out_dtype=dt))
    ins = _dot(ins_f, params["ins_out"], dt)

    # promote keeps bf16/f32 compute on the fp32 path; compute_dtype=float64
    # (torch-oracle parity tests) keeps full f64 end to end
    return jnp.concatenate([rgb, density, ins], axis=-1).astype(
        jnp.promote_types(jnp.float32, dt))
