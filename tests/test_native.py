"""Native C++ mesh-kernel tests: the ctypes library must agree exactly with
the numpy fallbacks (native/mesh_kernels.cc vs mesh/core.py + elements.py)."""

import numpy as np
import pytest

from hifiles_tpu import native
from hifiles_tpu.mesh.core import build_faces
from hifiles_tpu.mesh.generate import (periodic_hex_mesh,
                                       periodic_mixed_mesh_2d,
                                       periodic_tet_mesh)


def canon(conn):
    """Order-independent canonical form of the interior face set."""
    rows = set()
    for l, kl, r, kr, rt, nv in zip(conn.int_ele_l, conn.int_locf_l,
                                    conn.int_ele_r, conn.int_locf_r,
                                    conn.int_rot, conn.int_nv):
        a, b = (int(l), int(kl)), (int(r), int(kr))
        rows.add((min(a, b), max(a, b), int(nv)))
    bdy = sorted(zip(conn.bdy_ele.tolist(), conn.bdy_locf.tolist(),
                     conn.bdy_bcid.tolist()))
    return rows, bdy


def test_native_available():
    assert native.available(), "g++ toolchain should build libhfmesh.so"


@pytest.mark.parametrize("mesh_fn", [
    lambda: periodic_hex_mesh(3, 3, 3),
    lambda: periodic_tet_mesh(2, 2, 2),
    lambda: periodic_mixed_mesh_2d(6, 4, -1, 1, -1, 1),
])
def test_build_faces_native_matches_python(mesh_fn, monkeypatch):
    mesh = mesh_fn()
    delta = np.array([2 * np.pi] * mesh.n_dims) if mesh.n_dims == 3 \
        else np.array([2.0, 2.0])
    conn_nat = build_faces(mesh, {0: 9}, delta)
    monkeypatch.setattr(native, "build_faces_native", lambda *a: None)
    conn_py = build_faces(mesh, {0: 9}, delta)
    assert canon(conn_nat) == canon(conn_py)


def test_match_fpts_native_matches_python():
    from hifiles_tpu.solver.elements import match_fpts
    rng = np.random.default_rng(3)
    F, nfp, d = 40, 9, 3
    pl = rng.random((F, nfp, d))
    perm_true = np.stack([rng.permutation(nfp) for _ in range(F)])
    pr = np.take_along_axis(pl, perm_true[..., None], axis=1) + 0.37
    inv = np.argsort(perm_true, axis=1)
    got = native.match_fpts_native(pl, pr)
    assert got is not None
    for f in range(F):
        assert np.array_equal(got[f], inv[f])
        assert np.array_equal(got[f], match_fpts(pl[f], pr[f]))


def test_match_fpts_native_rejects_mismatch():
    rng = np.random.default_rng(4)
    pl = rng.random((3, 4, 2))
    pr = rng.random((3, 4, 2))   # unrelated points
    with pytest.raises(AssertionError):
        native.match_fpts_native(pl, pr)


def test_graph_partition_balanced_and_lower_cut():
    from hifiles_tpu.parallel.sharding import graph_partition
    mesh = periodic_hex_mesh(4, 4, 4)
    conn = build_faces(mesh, {0: 9}, np.array([2 * np.pi] * 3))
    part = graph_partition(conn, mesh.n_cells, 4)
    sizes = np.bincount(part, minlength=4)
    assert np.all(sizes == 16), sizes

    def cut(p):
        return int(np.sum(p[conn.int_ele_l] != p[conn.int_ele_r]))

    contiguous = np.repeat(np.arange(4), 16)
    # BFS-grown parts are compact: the cut must not exceed the naive
    # contiguous split on this periodic box
    assert cut(part) <= cut(contiguous), (cut(part), cut(contiguous))


def test_sharded_solver_graph_partition_matches_contiguous():
    import jax
    from hifiles_tpu.parallel.sharding import ShardedSolver
    from hifiles_tpu.config.params import RunInput
    p = RunInput()
    p.equation = 0
    p.viscous = 0
    p.order = 2
    p.ic_form = 0
    p.test_case = 1
    p.adv_type = 3
    p.riemann_solve_type = 0
    p.dt_type = 0
    p.dt = 1e-3
    p.mach_free_stream = 0.3
    p.dx_cyclic = 20.0
    p.dy_cyclic = 20.0
    from hifiles_tpu.mesh.generate import periodic_quad_mesh
    mesh = periodic_quad_mesh(8, 8, -10, 10, -10, 10)
    import jax.numpy as jnp
    devs = jax.devices()[:4]
    s_g = ShardedSolver(p, mesh, devices=devs, partition="graph",
                        dtype=jnp.float64)
    s_c = ShardedSolver(p, mesh, devices=devs, dtype=jnp.float64)
    s_g.run(10, dt=1e-3)
    s_c.run(10, dt=1e-3)
    np.testing.assert_allclose(s_g.gather_u(), s_c.gather_u(),
                               rtol=0, atol=1e-5)
