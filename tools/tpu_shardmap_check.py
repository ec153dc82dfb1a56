"""Compile + run the shard_map'd Pallas kernel paths on REAL TPU hardware.

The bench box has ONE chip, so the shard_map wrappers (make_field /
make_render_field with a mesh) normally only ever execute in CPU interpret
mode under the 8-virtual-device test mesh. DMNERF_FORCE_SHARD_MAP=1 routes
the wrappers on a 1-device mesh so the wrapped kernels go through the REAL
Mosaic lowering inside shard_map (verdict r2 item 6).

Run on the bench box:  python tools/tpu_shardmap_check.py
Passes when every wrapped output matches its unwrapped counterpart.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["DMNERF_FORCE_SHARD_MAP"] = "1"

from dmnerf_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    assert jax.default_backend() == "tpu", \
        f"this check must run on TPU (got {jax.default_backend()})"
    from dmnerf_tpu.models.fields import FieldConfig, init_field_params
    from dmnerf_tpu.ops.pallas.field_kernels import make_field
    from dmnerf_tpu.ops.pallas.render_field import (make_fused_chunk_renderer,
                                                    make_render_field)
    from dmnerf_tpu.parallel.mesh import make_mesh

    cfg = FieldConfig(netdepth=8, netwidth=256, multires=10, multires_views=4,
                      ins_num=32, compute_dtype=jnp.bfloat16)
    mesh = make_mesh()
    assert mesh.devices.size == 1, "bench box should expose one chip"

    key = jax.random.PRNGKey(0)
    params = init_field_params(key, cfg)
    R, S = 512, 64
    kr, kd, kz = jax.random.split(jax.random.PRNGKey(1), 3)
    pts = jax.random.normal(kr, (R, S, 3))
    dirs = jax.random.normal(kd, (R, 1, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    z = jnp.sort(jax.random.uniform(kz, (R, S), minval=1.0, maxval=12.0), -1)
    rays_d = dirs[:, 0, :]
    rays_o = pts[:, 0, :] * 0.1

    checks = []

    # 1) trainable field fwd + bwd through shard_map
    f_plain = make_field(cfg, trainable=True, mesh=None)
    f_sm = make_field(cfg, trainable=True, mesh=mesh)

    def loss(f, p):
        return jnp.sum(f(p, pts, dirs) ** 2) * 1e-6

    v0, g0 = jax.jit(jax.value_and_grad(lambda p: loss(f_plain, p)))(params)
    v1, g1 = jax.jit(jax.value_and_grad(lambda p: loss(f_sm, p)))(params)
    jax.block_until_ready(v1)
    err_v = abs(float(v0) - float(v1))
    err_g = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree_util.tree_leaves(g0),
                                jax.tree_util.tree_leaves(g1)))
    checks.append(("train fwd+bwd", err_v < 1e-4 and err_g < 1e-3,
                   f"dv={err_v:.2e} dg={err_g:.2e}"))

    # 2) forward-only field through shard_map
    e_plain = make_field(cfg, trainable=False, mesh=None)
    e_sm = make_field(cfg, trainable=False, mesh=mesh)
    r0 = jax.jit(lambda p: e_plain(p, pts, dirs))(params)
    r1 = jax.jit(lambda p: e_sm(p, pts, dirs))(params)
    err = float(jnp.max(jnp.abs(r0 - r1)))
    checks.append(("eval field fwd", err < 1e-4, f"draw={err:.2e}"))

    # 3) fused field+composite (all heads) through shard_map
    pp = {"coarse": params, "fine": params}
    rc0 = make_fused_chunk_renderer(cfg, 32, mesh=None)
    rc1 = make_fused_chunk_renderer(cfg, 32, mesh=mesh)
    o0 = jax.jit(lambda p: rc0(p, rays_o, rays_d, z))(pp)
    o1 = jax.jit(lambda p: rc1(p, rays_o, rays_d, z))(pp)
    err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(o0, o1))
    checks.append(("fused eval chunk", err < 1e-3, f"d={err:.2e}"))

    # 4) density-only fused kernel through shard_map
    w0 = make_render_field(cfg, heads="sigma", mesh=None)(params, pts, z, rays_d)
    w1 = make_render_field(cfg, heads="sigma", mesh=mesh)(params, pts, z, rays_d)
    err = float(jnp.max(jnp.abs(w0 - w1)))
    checks.append(("fused sigma kernel", err < 1e-4, f"dw={err:.2e}"))

    ok = True
    for name, passed, detail in checks:
        print(f"{'PASS' if passed else 'FAIL'}  {name:20s} {detail}")
        ok &= passed
    if not ok:
        sys.exit(1)
    print("shard_map'd kernel paths compile and match on real TPU")


if __name__ == "__main__":
    main()
