"""Core math: encoding, rays, sampling, compositing."""

import jax
import jax.numpy as jnp
import numpy as np

from dmnerf_tpu.core.encoding import encoding_dim, positional_encoding
from dmnerf_tpu.core.rays import get_rays, rays_at_pixels
from dmnerf_tpu.core.rendering import composite
from dmnerf_tpu.core.sampling import perturb_z_vals, sample_pdf, z_val_sample


def test_encoding_dims():
    assert encoding_dim(10) == 63
    assert encoding_dim(4) == 27
    x = jnp.ones((5, 3))
    assert positional_encoding(x, 10).shape == (5, 63)
    assert positional_encoding(x, 4).shape == (5, 27)


def test_encoding_values():
    x = jnp.array([[0.5, -1.0, 2.0]])
    enc = np.asarray(positional_encoding(x, 3))
    xs = np.array([0.5, -1.0, 2.0])
    expect = [xs]
    for f in [1.0, 2.0, 4.0]:
        expect.append(np.sin(xs * f))
        expect.append(np.cos(xs * f))
    np.testing.assert_allclose(enc[0], np.concatenate(expect), atol=1e-6)


def test_rays_at_pixels_matches_full_grid():
    H, W = 12, 16
    K = jnp.array([[20.0, 0, 8.0], [0, -20.0, 6.0], [0, 0, -1.0]])
    c2w = jnp.array([[1.0, 0, 0, 0.3], [0, 0.8, -0.6, 1.0],
                     [0, 0.6, 0.8, -0.5], [0, 0, 0, 1.0]])
    ro_full, rd_full = get_rays(H, W, K, c2w)
    pix = jnp.array([0, 5, W + 3, H * W - 1])
    ro, rd = rays_at_pixels(pix, W, K, c2w)
    np.testing.assert_allclose(np.asarray(ro),
                               np.asarray(ro_full.reshape(-1, 3)[pix]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd),
                               np.asarray(rd_full.reshape(-1, 3)[pix]), atol=1e-6)


def test_z_val_sample_linear_in_depth():
    z = np.asarray(z_val_sample(4, 2.0, 10.0, 5))
    np.testing.assert_allclose(z[0], [2, 4, 6, 8, 10], atol=1e-6)
    assert z.shape == (4, 5)


def test_perturb_stays_in_bins():
    key = jax.random.PRNGKey(0)
    z = z_val_sample(100, 1.0, 9.0, 16)
    zp = np.asarray(perturb_z_vals(key, z))
    z = np.asarray(z)
    mids = 0.5 * (z[..., 1:] + z[..., :-1])
    lower = np.concatenate([z[..., :1], mids], -1)
    upper = np.concatenate([mids, z[..., -1:]], -1)
    assert (zp >= lower - 1e-6).all() and (zp <= upper + 1e-6).all()


def test_sample_pdf_det_concentrates_mass():
    # all weight in one bin -> samples land inside that bin
    bins = jnp.linspace(0.0, 1.0, 11)[None].repeat(3, 0)  # [3, 11]
    w = jnp.zeros((3, 10)).at[:, 4].set(1.0)
    s = np.asarray(sample_pdf(bins, w, 32, det=True))
    # mass in bin 4 -> cdf jumps between bins[4] and bins[5]; the u=0 / u=1
    # endpoints land in the smoothing tails (same as the reference), so check
    # the interior samples.
    interior = s[:, 1:-1]
    assert (interior >= 0.4 - 1e-3).all() and (interior <= 0.5 + 1e-3).all()


def test_sample_pdf_matches_numpy_searchsorted():
    rng = np.random.default_rng(0)
    bins = np.sort(rng.uniform(0, 10, (4, 9)), axis=-1).astype(np.float32)
    w = rng.uniform(0.1, 2.0, (4, 8)).astype(np.float32)
    out = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(w), 16, det=True))
    # numpy oracle with identical semantics
    ww = w + 1e-5
    pdf = ww / ww.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((4, 1)), np.cumsum(pdf, -1)], -1)
    u = np.broadcast_to(np.linspace(0, 1, 16, dtype=np.float32), (4, 16))
    for r in range(4):
        inds = np.searchsorted(cdf[r], u[r], side="right")
        below = np.maximum(0, inds - 1)
        above = np.minimum(cdf.shape[-1] - 1, inds)
        denom = cdf[r][above] - cdf[r][below]
        denom = np.where(denom < 1e-5, 1.0, denom)
        t = (u[r] - cdf[r][below]) / denom
        expect = bins[r][below] + t * (bins[r][above] - bins[r][below])
        np.testing.assert_allclose(out[r], expect, atol=1e-5)


def test_sample_pdf_forms_bitwise_equal():
    """The MXU onehot-matmul form and the VPU masked-reduction form must be
    bitwise identical (the 'auto' switch between them may then never change
    numerics). Covers both sides of the auto threshold (batch 128) and both
    det and stochastic u, including degenerate all-equal-weight rows."""
    rng = np.random.default_rng(3)
    for batch in (6, 2048):
        bins = np.sort(rng.uniform(0, 10, (batch, 65)), -1).astype(np.float32)
        w = rng.uniform(0.0, 2.0, (batch, 64)).astype(np.float32)
        w[0] = 1.0  # uniform pdf row
        for det, key in ((True, None), (False, jax.random.PRNGKey(7))):
            a = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(w), 128,
                                      key=key, det=det, form="matmul"))
            b = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(w), 128,
                                      key=key, det=det, form="mask"))
            assert (a == b).all()


def test_sample_pdf_form_routing():
    """'auto' routes batch<=128 to the MXU matmul form (the edit path's
    chunked det calls) and larger batches to the VPU mask form (train 3072 /
    fused render 512 — see the measurement table in sampling.py); explicit
    forms and the bench's trace-time FORM_OVERRIDE take precedence; unknown
    form strings raise instead of silently falling through (advisor r4)."""
    import pytest

    import dmnerf_tpu.core.sampling as sampling

    def uses_mxu(batch, **kw):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (batch, 9))
        w = jnp.ones((batch, 8))
        jaxpr = jax.make_jaxpr(
            lambda b, ww: sample_pdf(b, ww, 4, det=True, **kw))(bins, w)
        return "dot_general" in str(jaxpr)

    assert uses_mxu(128)                       # auto: edit chunk -> matmul
    assert not uses_mxu(129)                   # auto: above threshold -> mask
    assert uses_mxu(2048, form="matmul")       # explicit form ignores batch
    assert not uses_mxu(64, form="mask")
    sampling.FORM_OVERRIDE = "matmul"
    try:
        assert uses_mxu(2048, form="mask")     # override beats the argument
    finally:
        sampling.FORM_OVERRIDE = None
    with pytest.raises(ValueError, match="unknown form"):
        sample_pdf(jnp.zeros((2, 9)), jnp.ones((2, 8)), 4, det=True,
                   form="masks")


def test_composite_opaque_surface():
    """A single very dense sample should dominate the composite."""
    R, S, K = 2, 8, 3
    z = jnp.broadcast_to(jnp.linspace(1.0, 8.0, S), (R, S))
    raw = jnp.zeros((R, S, 4 + K + 1))
    raw = raw.at[:, 3, 3].set(1e6)          # huge density at sample 3
    raw = raw.at[:, 3, 0].set(10.0)         # red-ish
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (R, 1))
    out = composite(raw, z, rays_d)
    np.testing.assert_allclose(np.asarray(out.weights[:, 3]), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(z[:, 3]), atol=1e-2)
    assert out.rgb.shape == (R, 3) and out.ins.shape == (R, K)


def test_composite_ins_weights_detached():
    """Gradients must not flow into density via the instance map (render.py:22-23)."""
    R, S, K = 1, 4, 2
    z = jnp.broadcast_to(jnp.linspace(1.0, 4.0, S), (R, S))
    rays_d = jnp.array([[0.0, 0.0, 1.0]])

    def f(sigma):
        raw = jnp.zeros((R, S, 4 + K + 1)).at[:, :, 3].set(sigma)
        out = composite(raw, z, rays_d)
        return jnp.sum(out.ins)

    g = jax.grad(f)(jnp.ones((R, S)))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-8)

    def f2(sigma):
        # depth-varying color so the composite is NOT invariant to the weights
        raw = (jnp.zeros((R, S, 4 + K + 1))
               .at[:, :, 3].set(sigma)
               .at[:, :, 0].set(z))
        out = composite(raw, z, rays_d)
        return jnp.sum(out.rgb)

    g2 = jax.grad(f2)(jnp.ones((R, S)))
    assert np.abs(np.asarray(g2)).sum() > 0  # rgb path does carry gradient
