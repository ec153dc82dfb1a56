"""Isolate WHERE the penalizer's in-step cost lives: full custom-VJP path,
forward-only (stop_gradient'd logits), and off."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dmnerf_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
import dmnerf_tpu.train.step as sm
from dmnerf_tpu.models.fields import FieldConfig
from dmnerf_tpu.train.step import create_train_state, make_train_scan_step
from tools.bench_step_anatomy import SCAN, make_args, scene_arrays, time_scan

def main():
    args = make_args(); scene = scene_arrays(); args.ins_num = 32
    cfg = FieldConfig.from_args(args)
    arrs = scene.to_device_arrays()
    i_train = jnp.asarray(np.asarray(scene.i_train), jnp.int32)
    base_key = jax.random.PRNGKey(1)
    real_pen = sm.ins_penalizer

    def run(tag, pen):
        sm.ins_penalizer = pen
        state = create_train_state(jax.random.PRNGKey(0), cfg, args.lrate, args.lrate_decay)
        fn = make_train_scan_step(args, cfg, scan_steps=SCAN)
        ms = time_scan(fn, state, arrs, base_key, i_train)
        print(f"{tag:16s} {ms:7.2f} ms/step", flush=True)
        sm.ins_penalizer = real_pen

    run("pen_full", real_pen)
    run("pen_fwd_only", lambda raw, z, d, rd, tol, dw:
        real_pen(jax.lax.stop_gradient(raw), z, d, rd, tol, dw))
    run("pen_zero", lambda raw, z, d, rd, tol, dw: jnp.float32(0.0))
    # value present but raw-sized cotangent zeroed: isolates the [R,S,C]
    # cotangent-add + residual traffic from the transcendentals
    run("pen_detached_plus_tiny", lambda raw, z, d, rd, tol, dw:
        real_pen(jax.lax.stop_gradient(raw), z, d, rd, tol, dw)
        + 0.0 * jnp.sum(raw[..., 4:]))

if __name__ == "__main__":
    main()
