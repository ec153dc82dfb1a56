"""Micro-benchmark of the DM-NeRF field fwd/bwd: XLA path vs fused Pallas kernels.

Isolates the field evaluation (the ~80% of the train step) at the reference fine
batch (3072 rays x 192 samples = 589,824 points).

Timing methodology (important on the axon tunnel): the op is repeated K times
INSIDE one jit via lax.scan with a scalar carry folded into the input, so every
iteration has distinct inputs and a true data dependency. Host-side repeat
loops are useless here: the loopback relay memoizes identical dispatches and
block_until_ready does not reliably fence — fetch a scalar (float()) to fence.
ms/call = (T(K) - T(1)) / (K - 1) also cancels dispatch latency.
"""

from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="xla,pallas")
    p.add_argument("--rays", type=int, default=3072)
    p.add_argument("--samples", type=int, default=192)
    p.add_argument("--k", type=int, default=16, help="in-jit repetitions")
    args = p.parse_args()

    from dmnerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dmnerf_tpu.models.fields import FieldConfig, apply_field, init_field_params

    cfg = FieldConfig(ins_num=32)
    params = init_field_params(jax.random.PRNGKey(0), cfg)
    R, S = args.rays, args.samples
    pts = jax.random.uniform(jax.random.PRNGKey(1), (R, S, 3), jnp.float32, -3, 3)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (R, 1, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    flops_fwd = 2 * 695_936 * R * S  # ~696k weights/field
    peak = 197e12  # v5e bf16 peak

    def scan_time(op, k):
        """Run op(x)->scalar k times chained inside one jit; return total s."""
        @jax.jit
        def many(x0):
            def body(c, _):
                return c + op(pts + c, params) * 1e-12, None
            c, _ = jax.lax.scan(body, x0, None, length=k)
            return c
        float(many(jnp.float32(0.0)))  # compile+first run
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(many(jnp.float32(i + 1) * 1e-5))  # float() = reliable fence
            best = min(best, time.perf_counter() - t0)
        return best

    def measure(name, op, mult):
        k = args.k
        t_k = scan_time(op, k)
        t_1 = scan_time(op, 1)
        ms = (t_k - t_1) / (k - 1) * 1e3
        tf = flops_fwd * mult / (ms * 1e-3) / 1e12
        print(f"{name:28s} {ms:8.2f} ms   {tf:6.1f} TF/s  "
              f"({100 * tf * 1e12 / peak:4.1f}% of bf16 peak)", flush=True)

    variants = args.variants.split(",")

    def fwd_op(field):
        def op(x, p):
            return jnp.sum(field(p, x, dirs)[0, 0])
        return op

    def grad_op(field):
        def loss(p, x):
            raw = field(p, x, dirs)
            return jnp.sum(raw * raw) * 1e-9
        def op(x, p):
            g = jax.grad(loss)(p, x)
            return jnp.sum(g["density"]["w"]) + jnp.sum(g["trunk"][0]["w"][0])
        return op

    if "xla" in variants:
        xla_field = lambda p, x, d: apply_field(p, cfg, x, d)
        measure("xla fwd", fwd_op(xla_field), 1)
        measure("xla fwd+bwd", grad_op(xla_field), 3)

    if "pallas" in variants:
        from dmnerf_tpu.ops.pallas.field_kernels import make_pallas_field
        from dmnerf_tpu.ops.pallas.field_kernels import make_trainable_pallas_field
        pf = make_pallas_field(cfg)
        measure("pallas fwd (eval kernel)", fwd_op(pf), 1)
        ptf = make_trainable_pallas_field(cfg)
        measure("pallas fwd (train kernel)", fwd_op(ptf), 1)
        measure("pallas fwd+bwd", grad_op(ptf), 4)  # bwd recomputes fwd


if __name__ == "__main__":
    main()
