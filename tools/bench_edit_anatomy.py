"""Attribute edit-path (whole-image manipulation) wall-clock to components.

Same ablation method as bench_step_anatomy.py: rebuild manipulate_chunk with
one component stubbed at a time, time each as an in-jit lax.scan over K whole
images (carry-folded inputs, scalar-fenced), report full - ablated as that
component's serialized device cost.

Variants (128x128, 1 object, chunk 512 by default — the BENCH workload):
  full          the deployed manipulate_chunk (pallas fields + fused accums)
  no_sort       every jnp.sort of z unions replaced by the unsorted concat
                (same shapes/flops downstream, breaks values)
  no_pdf        sample_pdf replaced by a linspace of the same shape
  no_exchange   both exchanger calls skipped (composite the ori raws directly)
  no_coarse_x   pass-1 exchange+recomposite+resample skipped (ori_zs2 := ori_zs)
  fields_only   the 6 field sweeps alone (2 coarse raw, 2 fused accum,
                2 fine raw at [*, 64+128+128*n_obj]), raws summed — the
                compute floor of the algorithm as implemented
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmnerf_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from dmnerf_tpu.core.rendering import composite
from dmnerf_tpu.core.sampling import sample_pdf, z_val_sample
from dmnerf_tpu.edit.manipulator import (_field_fns, _fine_accum_fn, exchanger)
from dmnerf_tpu.models.fields import FieldConfig, init_field_params


def chunk_variant(coarse_fn, fine_fn, accum_fn, move_labels, n_samples,
                  n_importance, near, far, *, sort=True, pdf=True,
                  exchange=True, coarse_x=True, fields_only=False):
    n_obj = len(move_labels)

    def sort_z(z):
        return jnp.sort(z, -1) if sort else z

    def pdf_z(mid, w, key_shape_n):
        if pdf:
            return sample_pdf(mid, w, n_importance, det=True)
        lin = jnp.linspace(near, far, n_importance)
        return jnp.broadcast_to(lin, (mid.shape[0], n_importance))

    def run(ori_o, ori_d, tar_os, tar_ds):
        N = ori_o.shape[0]
        tar_rays = [(tar_os[i], tar_ds[i]) for i in range(n_obj)]
        ori_z = z_val_sample(N, near, far, n_samples)

        def _raw(fn, o, d, z):
            vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            pts = o[..., None, :] + d[..., None, :] * z[..., :, None]
            return fn(pts, vd[..., None, :])

        if fields_only:
            # the 6 sweeps at deployed shapes; z sets made of linspaces
            z_full = jnp.broadcast_to(
                jnp.linspace(near, far, n_samples + n_importance),
                (N, n_samples + n_importance))
            z_union = jnp.broadcast_to(
                jnp.linspace(near, far,
                             n_samples + n_importance * (1 + n_obj)),
                (N, n_samples + n_importance * (1 + n_obj)))
            acc = jnp.sum(_raw(coarse_fn, ori_o, ori_d, ori_z))
            acc += jnp.sum(accum_fn(ori_o, ori_d, z_full))
            for to, td in tar_rays:
                acc += jnp.sum(_raw(coarse_fn, to, td, ori_z))
                acc += jnp.sum(accum_fn(to, td, z_full))
            acc += jnp.sum(_raw(fine_fn, ori_o, ori_d, z_union))
            for to, td in tar_rays:
                acc += jnp.sum(_raw(fine_fn, to, td, z_union))
            return acc * 1e-12, acc * 1e-12

        ori_raw = _raw(coarse_fn, ori_o, ori_d, ori_z)
        ori_w = composite(ori_raw, ori_z, ori_d, keep_air=True).weights
        ori_mid = 0.5 * (ori_z[..., 1:] + ori_z[..., :-1])
        ori_zs = pdf_z(ori_mid, ori_w[..., 1:-1], N)
        ori_z_full = sort_z(jnp.concatenate([ori_z, ori_zs], -1))
        ori_accum = accum_fn(ori_o, ori_d, ori_z_full)

        tar_raws, tar_accums, tar_zs_list = [], [], []
        for (to, td) in tar_rays:
            tz = z_val_sample(N, near, far, n_samples)
            traw = _raw(coarse_fn, to, td, tz)
            tw = composite(traw, tz, td, keep_air=True).weights
            tmid = 0.5 * (tz[..., 1:] + tz[..., :-1])
            tzs = pdf_z(tmid, tw[..., 1:-1], N)
            taccum = accum_fn(to, td, sort_z(jnp.concatenate([tz, tzs], -1)))
            tar_raws.append(traw)
            tar_accums.append(taccum)
            tar_zs_list.append(tzs)

        if coarse_x:
            if exchange:
                ori_raw_x = exchanger(ori_raw, tar_raws, ori_accum,
                                      tar_accums, move_labels)
            else:
                ori_raw_x = ori_raw
            w2 = composite(ori_raw_x, ori_z, ori_d, keep_air=True).weights
            ori_zs2 = pdf_z(ori_mid, w2[..., 1:-1], N)
        else:
            ori_zs2 = ori_zs

        all_tar_zs = jnp.concatenate(tar_zs_list, -1)
        ori_z2 = sort_z(jnp.concatenate([ori_z, ori_zs2, all_tar_zs], -1))

        ori_raw_f = _raw(fine_fn, ori_o, ori_d, ori_z2)
        tar_raws_f = [_raw(fine_fn, to, td, ori_z2) for (to, td) in tar_rays]
        if exchange:
            final_raw = exchanger(ori_raw_f, tar_raws_f, ori_accum,
                                  tar_accums, move_labels)
        else:
            final_raw = ori_raw_f + sum(r * 1e-12 for r in tar_raws_f)
        _f = composite(final_raw, ori_z2, ori_d, keep_air=True)
        return _f.rgb, _f.ins

    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hw", type=int, default=128)
    p.add_argument("--H", type=int, default=None)
    p.add_argument("--W", type=int, default=None)
    p.add_argument("--n_obj", type=int, default=1)
    p.add_argument("--chunk", type=int, default=512)
    p.add_argument("--k", type=int, default=8)
    args = p.parse_args()

    cfg = FieldConfig(ins_num=32)
    params = {"coarse": init_field_params(jax.random.PRNGKey(0), cfg),
              "fine": init_field_params(jax.random.PRNGKey(1), cfg)}
    H = args.H or args.hw
    W = args.W or args.hw
    n_rays = H * W
    assert n_rays % args.chunk == 0, (H, W, args.chunk)
    n_obj = args.n_obj
    move_labels = list(range(5, 5 + n_obj))
    near, far = 2.0, 6.0

    key = jax.random.PRNGKey(2)
    ori_o = jax.random.normal(key, (n_rays, 3))
    ori_d = jax.random.normal(jax.random.PRNGKey(3), (n_rays, 3))
    ori_d = ori_d / jnp.linalg.norm(ori_d, axis=-1, keepdims=True)
    tar_os = jnp.stack([ori_o + 0.1 * (i + 1) for i in range(n_obj)])
    tar_ds = jnp.stack([ori_d for _ in range(n_obj)])

    coarse_fn, fine_fn = _field_fns(cfg, params, use_pallas=True)
    accum_fn = _fine_accum_fn(cfg, params, use_pallas=True)
    chunk = args.chunk
    nc = n_rays // chunk

    results = {}

    def time_variant(tag, **kw):
        run_chunk = chunk_variant(coarse_fn, fine_fn, accum_fn, move_labels,
                                  64, 128, near, far, **kw)

        def one_image(oo_all, od_all, tos_all, tds_all):
            def one(c):
                oo, od, tos, tds = c
                rgb, ins = run_chunk(oo, od, tos, tds)
                return jnp.sum(rgb), jnp.sum(ins)
            parts = (oo_all.reshape(nc, chunk, 3),
                     od_all.reshape(nc, chunk, 3),
                     tos_all.reshape(n_obj, nc, chunk, 3).transpose(1, 0, 2, 3),
                     tds_all.reshape(n_obj, nc, chunk, 3).transpose(1, 0, 2, 3))
            a, b = jax.lax.map(one, parts)
            return jnp.sum(a) + jnp.sum(b)

        def scan_time(k):
            @jax.jit
            def many(c0):
                def body(c, _):
                    return (c + one_image(ori_o + c, ori_d, tar_os, tar_ds)
                            * 1e-12, None)
                c, _ = jax.lax.scan(body, c0, None, length=k)
                return c
            float(many(jnp.float32(0.0)))
            best = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                float(many(jnp.float32(i + 1) * 1e-5))
                best = min(best, time.perf_counter() - t0)
            return best

        t1 = scan_time(1)
        tk = scan_time(args.k)
        ms = (tk - t1) / (args.k - 1) * 1e3
        results[tag] = ms
        extra = "" if tag == "full" else f"   (delta {results['full'] - ms:+7.2f})"
        print(f"{tag:12s} {ms:8.2f} ms/image{extra}", flush=True)

    time_variant("full")
    time_variant("no_sort", sort=False)
    time_variant("no_pdf", pdf=False)
    time_variant("no_exchange", exchange=False)
    time_variant("no_coarse_x", coarse_x=False)
    time_variant("fields_only", fields_only=True)


if __name__ == "__main__":
    main()
