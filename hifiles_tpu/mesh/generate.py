"""Built-in structured mesh generators (periodic boxes for verification).

These produce MeshData with a single "Cyclic" boundary group so the same
cyclic-pairing code path as mesh-file runs (ref:src/geometry.cpp:351-415) is
exercised.
"""

from __future__ import annotations

import numpy as np

from .. import HEX, QUAD
from .core import MAX_F_PER_C, MAX_V_PER_C, MeshData


def periodic_quad_mesh(nx: int, ny: int, x0: float = -1.0, x1: float = 1.0,
                       y0: float = -1.0, y1: float = 1.0) -> MeshData:
    """Uniform nx x ny quad mesh on [x0,x1] x [y0,y1], all boundaries cyclic.

    c2v uses the reference's tensor ordering for linear quads:
    slots (0,1,2,3) = (bl, br, tl, tr) (ref:src/mesh_reader.cpp:205-206).
    """
    xs = np.linspace(x0, x1, nx + 1)
    ys = np.linspace(y0, y1, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    xv = np.stack([X.ravel(), Y.ravel()], axis=-1)

    def vid(i, j):
        return j * (nx + 1) + i

    C = nx * ny
    c2v = -np.ones((C, MAX_V_PER_C), dtype=np.int64)
    bc_id = -np.ones((C, MAX_F_PER_C), dtype=np.int64)
    for j in range(ny):
        for i in range(nx):
            c = j * nx + i
            c2v[c, 0] = vid(i, j)
            c2v[c, 1] = vid(i + 1, j)
            c2v[c, 2] = vid(i, j + 1)
            c2v[c, 3] = vid(i + 1, j + 1)
            if j == 0:
                bc_id[c, 0] = 0
            if i == nx - 1:
                bc_id[c, 1] = 0
            if j == ny - 1:
                bc_id[c, 2] = 0
            if i == 0:
                bc_id[c, 3] = 0
    return MeshData(n_dims=2, xv=xv, c2v=c2v,
                    c2n_v=np.full(C, 4, dtype=np.int64),
                    ctype=np.full(C, QUAD, dtype=np.int64),
                    bc_id=bc_id, bc_names=["Cyclic"],
                    ic2icg=np.arange(C, dtype=np.int64))


def channel_quad_mesh(nx: int, ny: int, x0: float, x1: float,
                      y0: float, y1: float,
                      bc_x: str = "Inflow", bc_X: str = "Outflow",
                      bc_y: str | None = None) -> MeshData:
    """Quad channel: named BC groups on x- (bc_x) and x+ (bc_X) boundaries;
    y boundaries cyclic by default or a named group ``bc_y``."""
    mesh = periodic_quad_mesh(nx, ny, x0, x1, y0, y1)
    names = [bc_x, bc_X, bc_y if bc_y is not None else "Cyclic"]
    bc_id = -np.ones_like(mesh.bc_id)
    for j in range(ny):
        for i in range(nx):
            c = j * nx + i
            if j == 0:
                bc_id[c, 0] = 2
            if i == nx - 1:
                bc_id[c, 1] = 1
            if j == ny - 1:
                bc_id[c, 2] = 2
            if i == 0:
                bc_id[c, 3] = 0
    mesh.bc_id = bc_id
    mesh.bc_names = names
    return mesh


def periodic_hex_mesh(nx: int, ny: int, nz: int,
                      x0: float = -np.pi, x1: float = np.pi,
                      y0: float = -np.pi, y1: float = np.pi,
                      z0: float = -np.pi, z1: float = np.pi) -> MeshData:
    """Uniform hex mesh on a periodic box (TGV domain by default).

    c2v tensor ordering for linear hexes: slot = i + 2j + 4k
    (ref:src/mesh_reader.cpp:240-241 remap).
    """
    xs = np.linspace(x0, x1, nx + 1)
    ys = np.linspace(y0, y1, ny + 1)
    zs = np.linspace(z0, z1, nz + 1)

    def vid(i, j, k):
        return (k * (ny + 1) + j) * (nx + 1) + i

    V = (nx + 1) * (ny + 1) * (nz + 1)
    xv = np.empty((V, 3))
    for k in range(nz + 1):
        for j in range(ny + 1):
            for i in range(nx + 1):
                xv[vid(i, j, k)] = (xs[i], ys[j], zs[k])

    C = nx * ny * nz
    c2v = -np.ones((C, MAX_V_PER_C), dtype=np.int64)
    bc_id = -np.ones((C, MAX_F_PER_C), dtype=np.int64)
    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                c = (k * ny + j) * nx + i
                c2v[c, 0] = vid(i, j, k)
                c2v[c, 1] = vid(i + 1, j, k)
                c2v[c, 2] = vid(i, j + 1, k)
                c2v[c, 3] = vid(i + 1, j + 1, k)
                c2v[c, 4] = vid(i, j, k + 1)
                c2v[c, 5] = vid(i + 1, j, k + 1)
                c2v[c, 6] = vid(i, j + 1, k + 1)
                c2v[c, 7] = vid(i + 1, j + 1, k + 1)
                # local face order (ref:src/mesh.cpp:752-793):
                # 0 bottom(z-), 1 front(y-), 2 right(x+), 3 back(y+),
                # 4 left(x-), 5 top(z+)
                if k == 0:
                    bc_id[c, 0] = 0
                if j == 0:
                    bc_id[c, 1] = 0
                if i == nx - 1:
                    bc_id[c, 2] = 0
                if j == ny - 1:
                    bc_id[c, 3] = 0
                if i == 0:
                    bc_id[c, 4] = 0
                if k == nz - 1:
                    bc_id[c, 5] = 0
    return MeshData(n_dims=3, xv=xv, c2v=c2v,
                    c2n_v=np.full(C, 8, dtype=np.int64),
                    ctype=np.full(C, HEX, dtype=np.int64),
                    bc_id=bc_id, bc_names=["Cyclic"],
                    ic2icg=np.arange(C, dtype=np.int64))
