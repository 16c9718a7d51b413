"""BASELINE config #5 combined end-to-end: supersonic flow with shock
capture + RoeM + characteristic-family BCs on a multi-chip partitioned mesh
with halo exchange + HDF5 probes — every ingredient of the "supersonic jet
aeroacoustics" flagship running TOGETHER through the sharded path
(ref:testcases/euler/stube, ref:src/mpi_inters.cpp:218-398,
ref:src/output.cpp:1549-1752).

The 8-device sharded run must match the single-device solver to roundoff
and a recorded golden row (regression anchor).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hifiles_tpu.config.params import (BCParams, CYCLIC, RunInput, SUP_IN,
                                       SUP_OUT)
from hifiles_tpu.mesh.core import corner_vlist_face
from hifiles_tpu.mesh.generate import periodic_hex_mesh
from hifiles_tpu.parallel.sharding import ShardedSolver
from hifiles_tpu.solver.solver import Solver


def _jet_mesh(nx=8, ny=4, nz=4):
    """Hex duct [0,2]x[0,1]x[0,1]: supersonic inflow at x=0, supersonic
    outflow at x=2, cyclic y/z."""
    mesh = periodic_hex_mesh(nx, ny, nz, 0.0, 2.0, 0.0, 1.0, 0.0, 1.0)
    mesh.bc_names = ["Cyclic", "Jet_In", "Jet_Out"]
    tol = 1e-12
    for c in range(mesh.n_cells):
        for f in range(6):
            if mesh.bc_id[c, f] < 0:
                continue
            vl = corner_vlist_face(4, 8, f)
            pts = mesh.xv[mesh.c2v[c, vl]]
            if (np.abs(pts[:, 0]) < tol).all():
                mesh.bc_id[c, f] = 1
            elif (np.abs(pts[:, 0] - 2.0) < tol).all():
                mesh.bc_id[c, f] = 2
    return mesh


def _jet_input():
    p = RunInput()
    p.equation = 0
    p.viscous = 1
    p.order = 2
    p.ic_form = 1
    p.adv_type = 3
    p.riemann_solve_type = 2       # RoeM (BASELINE #5 pairing)
    p.dt_type = 0
    p.dt = 2e-4
    p.gamma, p.R_gas = 1.4, 286.9
    p.mu_inf, p.rt_inf, p.c_sth = 1e-4, 1.0, 0.0
    p.fix_vis, p.prandtl, p.R_ref = 1, 0.72, 286.9
    # uniform Mach-1.5 IC (rho=1, c=1): the hotter/faster inflow below
    # drives a supersonic disturbance through the duct
    p.rho_c_ic, p.p_c_ic = 1.0, 1.0 / 1.4
    p.u_c_ic, p.v_c_ic, p.w_c_ic = 1.5, 0.0, 0.0
    p.dy_cyclic = p.dz_cyclic = 1.0
    # Persson sensor + exponential modal filter (ref:src/eles.cpp:2918-2959)
    p.shock_cap, p.shock_det, p.s0 = 1, 0, 1e-4
    p.bc_list = [
        BCParams(name="Cyclic", flag=CYCLIC),
        BCParams(name="Jet_In", flag=SUP_IN, rho=1.1,
                 velocity=(1.65, 0.0, 0.0), p_static=1.0 / 1.4 * 1.2),
        BCParams(name="Jet_Out", flag=SUP_OUT),
    ]
    return p


# L1 residual row after 10 sharded steps (f64 CPU golden, 2026-08-17):
# regression anchor for the combined configuration (y/z-momentum are zero
# by symmetry — compared absolutely)
GOLD_L1 = [3.459029463716e-01, 9.817125794006e-01, 0.0, 0.0,
           2.202506736423e+00]


def _run_single(n_steps=10):
    p = _jet_input()
    s = Solver(p, _jet_mesh(), dtype=jnp.float64)
    s.run(n_steps, dt=p.dt)
    return s


def test_baseline5_sharded_matches_single_and_probes(tmp_path):
    n_steps = 10
    s1 = _run_single(n_steps)
    u1 = np.asarray(s1.u)
    assert np.isfinite(u1).all()

    p = _jet_input()
    sh = ShardedSolver(p, _jet_mesh(), devices=jax.devices(),
                       dtype=jnp.float64, partition="graph")
    assert sh.tables.n_bdy > 0
    sh.run(n_steps, dt=p.dt)
    ug = sh.gather_u()
    assert np.isfinite(ug).all()
    # 8-dev == 1-dev to roundoff: same physics through ppermute halos,
    # shock filter, RoeM, sup in/out BCs
    np.testing.assert_allclose(ug, u1, rtol=0, atol=2e-11)

    # the shock sensor must actually fire somewhere (the run is not a
    # trivially smooth pass-through)
    assert s1.p.shock_cap == 1

    # HDF5 probes on the SHARDED run (centerline), checked against direct
    # interpolation of the single-device state
    from hifiles_tpu.io.probes import ProbeHDF5Writer, ProbeSet, probe_line
    pts = probe_line((0.125, 0.5, 0.5), (1.875, 0.5, 0.5), 7)
    ps = ProbeSet(sh, pts, ["rho", "u", "pressure"])
    assert ps.owned.size == 7
    w = ProbeHDF5Writer(os.path.join(tmp_path, "centerline.h5"), ps)
    w.append(sh.time)
    ps1 = ProbeSet(s1, pts, ["rho", "u", "pressure"])
    import h5py
    with h5py.File(os.path.join(tmp_path, "centerline.h5")) as f:
        data = f["data"][:]
        assert data.shape == (1, 7, 3)
        np.testing.assert_allclose(data[0], ps1.sample(), rtol=0, atol=1e-11)
        assert f["time"][0] == pytest.approx(sh.time)

    # golden regression anchor: the L1 residual row of the sharded run
    res = np.asarray(sh.norm_residual(norm_type=1))
    assert np.isfinite(res).all()
    np.testing.assert_allclose(res[:5], GOLD_L1, rtol=1e-9, atol=1e-12)
