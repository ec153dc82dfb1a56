"""Benchmark: train-step throughput (rays/sec/chip) on the reference workload.

Workload matches the reference's shipped configs (BASELINE.md): 3072 rays/step,
64 coarse + 128 importance samples, two 8x256 MLPs (PE 10/4), Hungarian-matched
instance loss + emptiness penalizer — i.e. the full hot loop of
/root/reference/train_dmsr.py:24-64, here as one jitted TPU step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline: the reference publishes no throughput (SURVEY.md §6). We estimate
the reference PyTorch single-GPU rate at 15,000 rays/s (≈5 it/s x 3072 rays on
a cu111-era GPU; consistent with ~786k point-MLP evals/step) and report
value / 15000.
"""

import json
import time

ASSUMED_REFERENCE_RAYS_PER_SEC = 15_000.0


def main():
    import jax

    from dmnerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from dmnerf_tpu.config import default_config
    from dmnerf_tpu.data.synthetic import make_scene
    from dmnerf_tpu.models.fields import FieldConfig
    from dmnerf_tpu.train.step import create_train_state, make_train_step

    args = default_config(
        N_train=3072, N_samples=64, N_importance=128,
        near=1.0, far=12.0, perturb=1.0,
        penalize=True, tolerance=0.05, deta_w=0.05,
        lrate=5e-4, lrate_decay=500, precision="bf16",
        netdepth=8, netwidth=256, multires=10, multires_views=4,
    )
    scene = make_scene(H=128, W=128, n_train=4, n_test=1)
    # reference scenes have ~30 object slots; synthetic scene supplies labels
    args.ins_num = 32
    cfg = FieldConfig.from_args(args)

    state = create_train_state(jax.random.PRNGKey(0), cfg, args.lrate, args.lrate_decay)
    step_fn = make_train_step(args, cfg)
    arrs = scene.to_device_arrays()

    # warmup/compile
    state, m = step_fn(state, arrs, jax.random.PRNGKey(1), jnp.int32(0))
    jax.block_until_ready(m["total_loss"])

    n_steps = 50
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for i in range(n_steps):
        img_i = jnp.int32(rng.integers(0, len(scene.i_train)))
        state, m = step_fn(state, arrs, jax.random.PRNGKey(i + 2), img_i)
    jax.block_until_ready(m["total_loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = args.N_train * n_steps / dt
    n_chips = max(len(jax.devices()), 1)
    value = rays_per_sec / n_chips
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(value / ASSUMED_REFERENCE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
