"""Partition quality: the spectral-bisection + Kernighan-Lin partitioner
(the ParMETIS analog, ref:src/geometry.cpp:1040-1200) must produce
balanced parts with an edge cut well under the element-id contiguous
baseline on a real unstructured mesh.  METIS itself is not in this image;
the recorded numbers document the measured quality for review.

Measured on the reference cylinder mesh (714 tris, 1051 interior faces,
8 parts), 2026-08-17: contiguous cut = 352, greedy-BFS grower = 221,
recursive spectral bisection = 120, spectral + KL refinement = 110
(10.5% of interior faces, 3.2x below contiguous; the ideal perimeter
scaling for 8 parts of a disc is ~130 edges, so this is METIS-class)."""

import os

import numpy as np
import pytest

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.gambit import read_gambit
from hifiles_tpu.mesh.core import build_faces
from hifiles_tpu.parallel.sharding import (_contiguous_partition,
                                           graph_partition)

CYL = "/root/reference/testcases/navier-stokes/cylinder"


def edge_cut(conn, part):
    return int(np.sum(part[conn.int_ele_l] != part[conn.int_ele_r]))


@pytest.mark.skipif(not os.path.isdir(CYL), reason="reference absent")
def test_partition_quality_cylinder():
    mesh = read_gambit(os.path.join(CYL, "cylinder_2ndorder_tri_vis.neu"))
    from hifiles_tpu.config.params import SUP_IN, ISOTHERM_WALL
    bc_flags = {i: SUP_IN for i in range(len(mesh.bc_names or []))} or {0: 0}
    conn = build_faces(mesh, bc_flags, np.array([1e30, 1e30]))
    n = mesh.n_cells
    part = graph_partition(conn, n, 8)
    sizes = np.bincount(part, minlength=8)
    assert sizes.max() - sizes.min() <= 1          # exact balance
    cut = edge_cut(conn, part)
    base = edge_cut(conn, _contiguous_partition(n, 8))
    n_int = conn.int_ele_l.size
    # must beat the contiguous baseline by at least 2.5x and keep the cut
    # under 13% of interior faces (measured: 110/1051 = 10.5%)
    assert cut * 2.5 <= base, (cut, base)
    assert cut <= 0.13 * n_int, (cut, n_int)
    # non-power-of-2 shard counts partition and balance too
    part7 = graph_partition(conn, n, 7)
    s7 = np.bincount(part7, minlength=7)
    assert s7.max() - s7.min() <= 1
    assert edge_cut(conn, part7) <= 0.15 * n_int


def test_partition_quality_3d_tgv_hex():
    """3-D partition evidence on the TGV 16^3 hex box (the headline bench
    mesh): spectral bisection + KL must cut at most ~half the contiguous
    split's edges (measured 844 vs 1792, 8 parts, ~1 s host-side)."""
    from hifiles_tpu.mesh.core import build_faces
    from hifiles_tpu.mesh.generate import periodic_hex_mesh
    from hifiles_tpu.parallel.sharding import (_contiguous_partition,
                                               graph_partition)

    mesh = periodic_hex_mesh(16, 16, 16)
    conn = build_faces(mesh, {0: 9}, np.array([2 * np.pi] * 3))

    def cut(p):
        return int(np.sum(p[conn.int_ele_l] != p[conn.int_ele_r]))

    part = graph_partition(conn, mesh.n_cells, 8)
    sizes = np.bincount(part, minlength=8)
    assert sizes.max() - sizes.min() <= 1
    assert cut(part) <= 0.55 * cut(_contiguous_partition(mesh.n_cells, 8))


def test_partition_quality_3d_50k():
    """Realistic-size 3-D mesh (51200 hexes): quality and the O(cut)
    host-side cost both hold at scale (measured cut 4944 vs 11200
    contiguous, 8 parts, ~11 s one-time host setup on this 1-core host —
    the cut-front KL keeps refinement O(passes * cut), not O(N * deg))."""
    import time

    from hifiles_tpu.mesh.core import build_faces
    from hifiles_tpu.mesh.generate import periodic_hex_mesh
    from hifiles_tpu.parallel.sharding import (_contiguous_partition,
                                               graph_partition)

    mesh = periodic_hex_mesh(40, 40, 32)
    conn = build_faces(mesh, {0: 9}, np.array([2 * np.pi] * 3))

    def cut(p):
        return int(np.sum(p[conn.int_ele_l] != p[conn.int_ele_r]))

    t0 = time.time()
    part = graph_partition(conn, mesh.n_cells, 8)
    elapsed = time.time() - t0
    sizes = np.bincount(part, minlength=8)
    assert sizes.max() - sizes.min() <= 1
    assert cut(part) <= 0.6 * cut(_contiguous_partition(mesh.n_cells, 8))
    assert elapsed < 120.0, f"partition took {elapsed:.0f}s"
