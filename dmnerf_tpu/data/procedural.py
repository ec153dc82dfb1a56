"""Parameterized analytic scenes for reference-format stress fixtures.

Generalizes data/synthetic.py to N objects (boxes + spheres) with arbitrary
per-object affine transforms, so tools/make_stress_scenes.py can write harder
scenes TO DISK in the three reference dataset formats (DM-SR / Replica /
ScanNet) and render exact manipulation ground truth (the edited scene is just
the same object list with one object's inverse transform changed).

Everything is host-side numpy; rendering marches dense samples with the same
compositing math as the renderer (render.py:6-28 semantics), chunked by rows
to bound memory at 640x480.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class Obj:
    kind: str                 # 'box' | 'sphere'
    center: np.ndarray        # [3]
    size: np.ndarray          # [3] half-extents (box) or [r, _, _] (sphere)
    color: np.ndarray         # [3] in [0, 1]
    label: int
    # points are mapped through xform BEFORE the occupancy test: moving an
    # object by T means setting xform = T^-1 is NOT needed — the manipulator
    # convention (tar rays = T @ pose, manipulator.py:239) shows the object
    # where p satisfies T(p) in original region, i.e. xform = T.
    xform: Optional[np.ndarray] = None  # [4, 4] or None

    def occupancy(self, pts, xp=np):
        q = pts
        if self.xform is not None:
            x = xp.asarray(self.xform, pts.dtype)
            q = pts @ x[:3, :3].T + x[:3, 3]
        if self.kind == "box":
            return (xp.abs(q - xp.asarray(self.center, pts.dtype))
                    < xp.asarray(self.size, pts.dtype)).all(-1)
        d = q - xp.asarray(self.center, pts.dtype)
        return (d * d).sum(-1) < float(self.size[0]) ** 2


ROOM_HALF = np.array([6.0, 6.0, 6.0])
ROOM_COLOR = np.array([0.72, 0.72, 0.76])
WALL_THICK = 0.4
DENSITY = 60.0


def make_objects(n: int, seed: int = 0, room_half=ROOM_HALF) -> List[Obj]:
    """n distinct objects (labels 1..n; label 0 = room) placed on a jittered
    ring + inner grid inside the room so most are visible from orbit cameras."""
    rng = np.random.default_rng(seed)
    objs = []
    golden = np.pi * (3 - np.sqrt(5))
    for i in range(n):
        ang = i * golden
        rad = 1.2 + 3.2 * ((i % 4) / 3.0)            # four rings
        c = np.array([rad * np.cos(ang), rad * np.sin(ang),
                      rng.uniform(-0.8, 1.4)])
        kind = "box" if i % 3 else "sphere"
        if kind == "box":
            size = rng.uniform(0.35, 0.75, 3)
        else:
            size = np.array([rng.uniform(0.35, 0.65)] * 3)
        # distinct, saturated colors (golden-angle hue walk)
        h = (i * 0.381966) % 1.0
        col = _hsv(h, 0.75, 0.55 + 0.4 * ((i % 2)))
        objs.append(Obj(kind, c, size, col, label=i + 1))
    return objs


def _hsv(h, s, v):
    i = int(h * 6) % 6
    f = h * 6 - int(h * 6)
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
    return np.array([(v, t, p), (q, v, p), (p, v, t),
                     (p, q, v), (t, p, v), (v, p, q)][i])


def field_at(pts, objs: List[Obj], xp=np):
    """Analytic (sigma, rgb, label) at [..., 3] points. Label 0 = room shell;
    later objects overwrite earlier ones where they overlap. xp=jax.numpy
    runs the same math on device (the stress-scene generator jits this)."""
    sh = pts.shape[:-1]
    sigma = xp.zeros(sh, np.float32)
    rgb = xp.zeros(sh + (3,), np.float32)
    label = xp.zeros(sh, np.int32)

    d = xp.abs(pts) - xp.asarray(ROOM_HALF, pts.dtype)
    near_wall = (d < 0).all(-1) & (d.max(-1) > -WALL_THICK)
    sigma = xp.where(near_wall, DENSITY, sigma)
    rgb = xp.where(near_wall[..., None], xp.asarray(ROOM_COLOR, pts.dtype), rgb)

    for o in objs:
        inside = o.occupancy(pts, xp)
        sigma = xp.where(inside, DENSITY, sigma)
        rgb = xp.where(inside[..., None], xp.asarray(o.color, pts.dtype), rgb)
        label = xp.where(inside, o.label, label)
    return sigma, rgb, label


def _march_chunk(pose, j, i, Kr, z, dists0, objs, xp):
    """One row-chunk of dense marching. pose [3,4] f32; j/i pixel coords."""
    dirs = xp.stack([(i - Kr[0, 2]) / Kr[0, 0], (j - Kr[1, 2]) / Kr[1, 1],
                     Kr[2, 2] * xp.ones_like(i)], -1)
    rays_d = (dirs @ pose[:3, :3].T).astype(np.float32)
    rays_o = xp.broadcast_to(pose[:3, 3], rays_d.shape)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z[:, None]
    sigma, rgb, lab = field_at(pts, objs, xp)
    dists = dists0 * xp.linalg.norm(rays_d, axis=-1)[..., None]
    alpha = 1.0 - xp.exp(-sigma * dists)
    trans = xp.cumprod(xp.concatenate(
        [xp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1), -1)[..., :-1]
    w = alpha * trans
    img = (w[..., None] * rgb).sum(-2).astype(np.float32)
    top = xp.argmax(w, axis=-1)
    lab_img = xp.take_along_axis(lab, top[..., None], -1)[..., 0]
    return img, lab_img


_JIT_CACHE = {}


def render_gt(pose, H, W, K, near, far, objs, n_samples=192, row_chunk=60,
              xp=np):
    """Dense-march GT (image f32 [H,W,3], labels int32 [H,W]), row-chunked.
    With xp=jax.numpy the whole chunk march is ONE jitted dispatch (eager
    per-op dispatch over the axon tunnel is ~1000x slower)."""
    if H % row_chunk:
        row_chunk = next(c for c in range(row_chunk, 0, -1) if H % c == 0)
    pose34 = np.asarray(pose, np.float32)[:3, :4]
    Kr = np.asarray(K, np.float32)
    z = np.linspace(near, far, n_samples, dtype=np.float32)
    dists0 = np.append(np.diff(z), np.float32(1e10)).astype(np.float32)

    fn = None
    if xp is not np:
        import jax
        # keyed by the LIST identity: edited_objects returns a fresh list, and
        # callers keep each scene's list alive for the render batch
        key = (id(objs), len(objs), row_chunk, W, n_samples)
        fn = _JIT_CACHE.get(key)
        if fn is None:
            fn = jax.jit(lambda pose, j, i, Kr, z, d0: _march_chunk(
                pose, j, i, Kr, z, d0, objs, xp))
            _JIT_CACHE[key] = fn

    imgs, labs = [], []
    for r0 in range(0, H, row_chunk):
        j, i = np.meshgrid(np.arange(r0, r0 + row_chunk, dtype=np.float32),
                           np.arange(W, dtype=np.float32), indexing="ij")
        if fn is not None:
            img, lab_img = fn(pose34, j, i, Kr, z, dists0)
        else:
            img, lab_img = _march_chunk(pose34, j, i, Kr, z, dists0, objs, np)
        imgs.append(np.asarray(img))
        labs.append(np.asarray(lab_img))
    return np.concatenate(imgs, 0), np.concatenate(labs, 0).astype(np.int32)


def edited_objects(objs: List[Obj], move_label: int, T: np.ndarray) -> List[Obj]:
    """Scene with the object of `move_label` moved per the manipulator
    convention: querying along rays transformed by T shows the object where
    T(p) hits its original region — exactly Obj.xform = T composed with any
    existing xform."""
    out = []
    for o in objs:
        if o.label == move_label:
            x = T if o.xform is None else o.xform @ T
            out.append(dataclasses.replace(o, xform=np.asarray(x, np.float64)))
        else:
            out.append(o)
    return out


def palette(n_labels: int, seed: int = 1) -> np.ndarray:
    """uint8 [n_labels, 3] distinct colors (label 0 = room gets gray)."""
    cols = [np.array([185, 185, 193], np.uint8)]
    for i in range(1, n_labels):
        h = (i * 0.381966 + 0.11) % 1.0
        cols.append((255 * _hsv(h, 0.85, 0.95)).astype(np.uint8))
    return np.stack(cols)
