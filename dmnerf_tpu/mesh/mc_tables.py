"""Marching-cubes case tables, generated algorithmically.

The reference uses skimage.measure.marching_cubes (mesh_generator.py:68).
Rather than transcribing the classic 256x16 triangle table (an opaque blob
that cannot be reviewed), we DERIVE it: for each of the 256 corner-sign
configurations, trace the isosurface polygons by walking the cube's faces —
on each face the isoline pairs up the cut edges; on ambiguous (saddle) faces
the pairing keeps the INSIDE corners separated. Since a shared face has the
same corner signs seen from both neighboring cubes, both cubes make the same
pairing choice, so the mesh is crack-free and watertight by construction
(validated in tests/test_mesh.py: structural table checks + analytic
sphere/box isosurfaces).

Cube layout matches mesh/marching.py's _CORNERS:
  0:(0,0,0) 1:(1,0,0) 2:(1,1,0) 3:(0,1,0) 4:(0,0,1) 5:(1,0,1) 6:(1,1,1) 7:(0,1,1)
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

CORNERS = np.array([
    (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
    (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
], np.int64)

# 12 cube edges as (corner_a, corner_b)
EDGES = np.array([
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
], np.int64)

# 6 faces as corner cycles
_FACES = [
    (0, 1, 2, 3), (4, 5, 6, 7),
    (0, 1, 5, 4), (3, 2, 6, 7),
    (0, 3, 7, 4), (1, 2, 6, 5),
]

_EDGE_OF = {frozenset(e): i for i, e in enumerate(map(tuple, EDGES))}

MAX_TRIS = 5  # a cube case yields at most 5 triangles under this rule


def _case_polygons(case: int) -> List[List[int]]:
    """Isosurface polygons (lists of cut-edge indices) for one sign case."""
    inside = [(case >> i) & 1 for i in range(8)]
    cut = [i for i, (a, b) in enumerate(EDGES) if inside[a] != inside[b]]
    if not cut:
        return []

    # pairing of cut edges per face: each cut edge gets one partner per
    # adjacent face -> every cut edge has exactly two links -> cycles
    links = {e: [] for e in cut}
    for face in _FACES:
        fedges = [_EDGE_OF[frozenset((face[k], face[(k + 1) % 4]))]
                  for k in range(4)]
        fcut = [e for e in fedges if e in links]
        if len(fcut) == 2:
            a, b = fcut
            links[a].append(b)
            links[b].append(a)
        elif len(fcut) == 4:
            # saddle: pair edges sharing an INSIDE corner (separates the two
            # inside corners; sign-symmetric across neighboring cubes)
            for i in range(4):
                for j in range(i + 1, 4):
                    ei, ej = fedges[i], fedges[j]
                    shared = set(EDGES[ei]) & set(EDGES[ej])
                    if shared and inside[shared.pop()]:
                        links[ei].append(ej)
                        links[ej].append(ei)

    for e, l in links.items():
        assert len(l) == 2, (case, e, l)

    polys = []
    todo = set(cut)
    while todo:
        start = min(todo)
        poly = [start]
        todo.discard(start)
        prev, cur = None, start
        while True:
            nxt = links[cur][0] if links[cur][0] != prev else links[cur][1]
            if nxt == start:
                break
            poly.append(nxt)
            todo.discard(nxt)
            prev, cur = cur, nxt
        polys.append(poly)

    # orient each polygon: Newell normal points from inside toward outside
    mids = (CORNERS[EDGES[:, 0]] + CORNERS[EDGES[:, 1]]) / 2.0
    c_in = CORNERS[[i for i in range(8) if inside[i]]].mean(0)
    c_out = CORNERS[[i for i in range(8) if not inside[i]]].mean(0)
    d = c_out - c_in
    oriented = []
    for poly in polys:
        pts = mids[poly]
        n = np.zeros(3)
        for k in range(len(pts)):
            a, b = pts[k], pts[(k + 1) % len(pts)]
            n += np.cross(a, b)
        if np.dot(n, d) < 0:
            poly = poly[::-1]
        oriented.append(poly)
    return oriented


@functools.lru_cache(maxsize=1)
def build_tables() -> Tuple[np.ndarray, np.ndarray]:
    """Returns (tri_table [256, 3*MAX_TRIS] int32, -1 padded;
    n_tris [256] int32). tri_table entries are cube-edge indices."""
    tri_table = -np.ones((256, 3 * MAX_TRIS), np.int32)
    n_tris = np.zeros(256, np.int32)
    for case in range(256):
        tris = []
        for poly in _case_polygons(case):
            for k in range(1, len(poly) - 1):  # fan triangulation
                tris.append((poly[0], poly[k], poly[k + 1]))
        assert len(tris) <= MAX_TRIS, (case, len(tris))
        n_tris[case] = len(tris)
        for t, tri in enumerate(tris):
            tri_table[case, 3 * t:3 * t + 3] = tri
    return tri_table, n_tris
