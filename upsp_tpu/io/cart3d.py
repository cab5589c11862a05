"""Cart3D ASCII ``.tri`` / ``.triq`` unstructured surface mesh I/O.

``.tri``:   ``n_verts n_tris`` / vertex xyz lines / 1-based connectivity lines /
optional per-tri component ids.
``.triq``:  ``n_verts n_tris n_scalars`` / vertices / connectivity / components /
per-vertex scalars.

Parity: cpp/lib/cart3d.cpp:read_tri/read_triq (studied, not copied).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class TriMesh:
    vertices: np.ndarray  # (N, 3) float32
    triangles: np.ndarray  # (T, 3) int32, 0-based
    components: Optional[np.ndarray] = None  # (T,) int32
    scalars: Optional[np.ndarray] = None  # (N, S) float32

    @property
    def size(self) -> int:
        return int(self.vertices.shape[0])


def read_tri(filename: str) -> TriMesh:
    with open(filename, "r") as f:
        tokens = f.read().split()
    it = iter(tokens)
    n_verts = int(next(it))
    n_tris = int(next(it))
    # .triq has a third header int (number of scalars)
    rest = list(it)
    n_scalars = 0
    body = rest
    expected_tri = 3 * n_verts + 3 * n_tris
    if len(rest) >= 1:
        # detect triq: header has one extra int before vertex data
        cand = int(float(rest[0]))
        triq_len = 3 * n_verts + 3 * n_tris + n_tris + cand * n_verts + 0
        if float(rest[0]).is_integer() and (len(rest) - 1) >= triq_len and cand > 0:
            # assume .triq when the extra-header interpretation fits exactly
            if (len(rest) - 1) in (triq_len, triq_len):
                n_scalars = cand
                body = rest[1:]
    vals = np.array(body, dtype=np.float64)
    verts = vals[: 3 * n_verts].reshape(n_verts, 3).astype(np.float32)
    off = 3 * n_verts
    tris = vals[off : off + 3 * n_tris].reshape(n_tris, 3).astype(np.int64) - 1
    off += 3 * n_tris
    comps = None
    scalars = None
    remaining = vals[off:]
    if n_scalars:
        comps = remaining[:n_tris].astype(np.int32)
        remaining = remaining[n_tris:]
        scalars = (
            remaining[: n_scalars * n_verts]
            .reshape(n_verts, n_scalars)
            .astype(np.float32)
        )
    elif remaining.size >= n_tris:
        comps = remaining[:n_tris].astype(np.int32)
    return TriMesh(
        vertices=verts,
        triangles=tris.astype(np.int32),
        components=comps,
        scalars=scalars,
    )


def write_tri(filename: str, mesh: TriMesh) -> None:
    with open(filename, "w") as f:
        f.write(f"{mesh.size} {mesh.triangles.shape[0]}\n")
        for v in mesh.vertices:
            f.write(f"{v[0]:.9g} {v[1]:.9g} {v[2]:.9g}\n")
        for t in mesh.triangles:
            f.write(f"{t[0] + 1} {t[1] + 1} {t[2] + 1}\n")
        if mesh.components is not None:
            for c in mesh.components:
                f.write(f"{int(c)}\n")
