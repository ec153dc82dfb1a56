"""Micro-benchmark of the non-field train-step pieces: instance criterion
(cost matmuls + in-graph LAP), emptiness penalizer, and sample_pdf.

Same in-jit lax.scan timing methodology as tools/bench_field.py (host repeat
loops are meaningless over the axon relay). Each op is measured fwd+bwd where
it carries gradients in the real step.

Usage: python tools/bench_losses.py [--k 32] [--valid 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--rays", type=int, default=3072)
    p.add_argument("--ins_num", type=int, default=32)
    p.add_argument("--valid", type=int, default=30,
                   help="distinct GT labels present in the batch")
    args = p.parse_args()
    assert args.k >= 4, "--k must be >= 4 (timing is (T(k)-T(1))/(k-1))"
    assert 1 <= args.valid <= args.ins_num

    from dmnerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dmnerf_tpu.core.sampling import sample_pdf
    from dmnerf_tpu.losses.emptiness import ins_penalizer
    from dmnerf_tpu.losses.instance import ins_criterion_pair

    R, K = args.rays, args.ins_num
    S = 192
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    logits_c = jax.random.normal(ks[0], (R, K), jnp.float32)
    logits_f = jax.random.normal(ks[1], (R, K), jnp.float32)
    gt = jax.random.randint(ks[2], (R,), 0, args.valid)
    raw = jax.random.normal(ks[3], (R, S, 4 + K + 1), jnp.float32)
    z_vals = jnp.sort(jax.random.uniform(ks[4], (R, S), jnp.float32, 1.0, 12.0), -1)
    depth = jax.random.uniform(ks[5], (R,), jnp.float32, 2.0, 10.0)
    rays_d = jax.random.normal(ks[6], (R, 3), jnp.float32)
    w_coarse = jax.random.uniform(ks[7], (R, 63), jnp.float32)
    bins = jnp.linspace(1.0, 12.0, 64)[None].repeat(R, 0)

    def scan_time(op, k):
        @jax.jit
        def many(x0):
            def body(c, _):
                return c + op(c) * 1e-12, None
            c, _ = jax.lax.scan(body, x0, None, length=k)
            return c
        float(many(jnp.float32(0.0)))
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(many(jnp.float32(i + 1) * 1e-5))
            best = min(best, time.perf_counter() - t0)
        return best

    def measure(name, op):
        t_k = scan_time(op, args.k)
        t_1 = scan_time(op, 1)
        ms = (t_k - t_1) / (args.k - 1) * 1e3
        print(f"{name:36s} {ms:8.3f} ms", flush=True)

    # instance criterion fwd+bwd (as in the step: grads flow to the logits)
    def ins_op(c):
        def loss(lc, lf):
            pc, pf = jax.nn.sigmoid(lc), jax.nn.sigmoid(lf)
            a, b = ins_criterion_pair(pc, pf, gt, K, logits_coarse=lc,
                                      logits_fine=lf)
            return a.total + b.total
        ga, gb = jax.grad(loss, argnums=(0, 1))(logits_c + c, logits_f + c)
        return jnp.sum(ga[0]) + jnp.sum(gb[0])
    measure(f"ins_criterion_pair fwd+bwd (v={args.valid})", ins_op)

    # penalizer fwd+bwd on the fine raw (the bigger of the two calls)
    def pen_op(c):
        def loss(r):
            return ins_penalizer(r, z_vals, depth, rays_d, 0.05, 0.05)
        g = jax.grad(loss)(raw + c)
        return jnp.sum(g[0, 0])
    measure("ins_penalizer fine fwd+bwd", pen_op)

    # sample_pdf (no grads in the step: result is stop_gradient'd)
    def pdf_op(c):
        z = sample_pdf(bins, w_coarse + c, 128, det=True)
        return jnp.sum(z[0])
    measure("sample_pdf det", pdf_op)

    # alpha compositing fwd+bwd on the fine raw (grads flow through rgb and,
    # via the detached-weights path, the ins logits)
    from dmnerf_tpu.core.rendering import composite
    def comp_op(c):
        def loss(r):
            out = composite(r, z_vals, rays_d)
            return jnp.sum(out.rgb) + jnp.sum(out.ins_logits) + jnp.sum(out.depth)
        g = jax.grad(loss)(raw + c)
        return jnp.sum(g[0, 0])
    measure("composite fine fwd+bwd", comp_op)

    # sorted union of coarse+fine z (render_rays:106)
    z64 = z_vals[:, :64]
    z128 = jax.random.uniform(ks[0], (R, 128), jnp.float32, 1.0, 12.0)
    def sort_op(c):
        z = jnp.sort(jnp.concatenate([z64, z128 + c], -1), -1)
        return jnp.sum(z[0])
    measure("sort union 64+128", sort_op)


if __name__ == "__main__":
    main()
