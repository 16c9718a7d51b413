"""Wall models on mixed meshes (round-3 closure of multiblock.py's former
NotImplementedError; ref:src/bdy_inters.cpp:1095-1131 wall-models any
boundary face regardless of element type)."""

import numpy as np
import pytest

from hifiles_tpu import QUAD, TRI
from hifiles_tpu.config.params import BCParams, CYCLIC, ISOTHERM_WALL
from hifiles_tpu.mesh.generate import channel_quad_mesh, periodic_mixed_mesh_2d
from hifiles_tpu.solver.multiblock import MixedSolver
from hifiles_tpu.solver.solver import Solver

from test_rans_viscous_bc import _rans_channel_input


def _wm_input():
    p = _rans_channel_input()
    p.RANS = 0
    p.LES, p.SGS_model, p.C_s = 1, 0, 0.1
    p.wall_model = 1
    p.bc_list = [BCParams(name="Cyc", flag=CYCLIC),
                 BCParams(name="unused", flag=CYCLIC),
                 BCParams(name="Wall", flag=ISOTHERM_WALL,
                          T_static=1.0, use_wm=1)]
    return p


def _channel_mesh():
    mesh = channel_quad_mesh(8, 4, 0.0, 4.0, 0.0, 1.0,
                             bc_x="Cyc", bc_X="Cyc", bc_y="Wall")
    mesh.bc_id[mesh.bc_id == 1] = 0
    mesh.bc_names = ["Cyc", "unused", "Wall"]
    return mesh


def test_mixed_wm_matches_single_type():
    """A pure-quad wall-modeled channel through MixedSolver must reproduce
    the single-type Solver residual to roundoff."""
    p = _wm_input()
    s1 = Solver(p, _channel_mesh())
    sm = MixedSolver(_wm_input(), _channel_mesh())
    assert sm._wm_tables is not None
    rng = np.random.default_rng(0)
    u = np.asarray(s1.u) * (1.0 + 0.02 * rng.random(np.asarray(s1.u).shape))
    r1 = np.asarray(s1.residual_fn(u))
    rm = np.asarray(sm.residual_fn((u,))[0])
    scale = max(np.abs(r1).max(), 1.0)
    assert np.abs(r1 - rm).max() < 1e-10 * scale, np.abs(r1 - rm).max()


def _mixed_wall_mesh(nx=8, ny=4):
    """Tri+quad box with wall-modeled walls at y=0/1, cyclic in x."""
    from hifiles_tpu.mesh.core import NUM_F_PER_C, corner_vlist_face
    mesh = periodic_mixed_mesh_2d(nx, ny, 0.0, 4.0, 0.0, 1.0)
    mesh.bc_names = ["Cyc", "unused", "Wall"]
    tol = 1e-10
    for c in range(mesh.n_cells):
        for k in range(NUM_F_PER_C[int(mesh.ctype[c])]):
            if mesh.bc_id[c, k] < 0:
                continue
            vl = corner_vlist_face(int(mesh.ctype[c]),
                                   int(mesh.c2n_v[c]), k)
            pts = mesh.xv[mesh.c2v[c, vl]]
            on_y = ((np.abs(pts[:, 1]) < tol).all()
                    or (np.abs(pts[:, 1] - 1.0) < tol).all())
            mesh.bc_id[c, k] = 2 if on_y else 0
    return mesh


def test_mixed_tri_quad_wall_model_runs():
    p = _wm_input()
    p.dx_cyclic = 4.0
    mesh = _mixed_wall_mesh()
    s = MixedSolver(p, mesh)
    assert s._wm_tables is not None
    per_ct, wm_dist = s._wm_tables
    # wall faces exist on both element types in this mesh
    assert per_ct[QUAD][0].size > 0
    assert per_ct[TRI][0].size > 0
    s.run(20, dt=p.dt)
    for u in s.u:
        a = np.asarray(u)
        assert np.isfinite(a).all()
        assert a[..., 0].min() > 0
