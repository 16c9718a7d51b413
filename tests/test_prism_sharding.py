"""Prism sharding: mixed tri/quad face shapes in the halo tables
(variable nfp rows padded to the max, ref:src/mpi_inters.cpp buffers are
per-face-shape; here one padded table)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import periodic_prism_mesh
from hifiles_tpu.parallel.sharding import ShardedSolver
from hifiles_tpu.solver.solver import Solver


def prism_input(viscous=0):
    p = RunInput()
    p.equation = 0
    p.viscous = viscous
    p.order = 2
    p.ic_form = 7 if not viscous else 7     # Taylor-Green
    p.adv_type = 3
    p.riemann_solve_type = 0
    p.dt_type = 0
    p.dt = 1e-3
    p.gamma, p.R_gas, p.fix_vis = 1.4, 286.9, 1
    p.prandtl = 0.72
    p.Mach_free_stream, p.T_free_stream = 0.1, 300.0
    p.rho_free_stream = 0.0008421095852102401
    p.mu_gas = 1.827e-5
    p.L_free_stream = 1.0
    p.Mach_c_ic, p.T_c_ic, p.rho_c_ic = 0.1, 300.0, 0.0008421095852102401
    p.dx_cyclic = p.dy_cyclic = p.dz_cyclic = 2 * np.pi
    p.setup_params()
    return p


@pytest.mark.parametrize("viscous", [0, 1])
def test_sharded_prisms_match_single(viscous):
    mesh = periodic_prism_mesh(2, 2, 2)      # 16 prisms
    p1 = prism_input(viscous)
    s1 = Solver(p1, mesh, dtype=jnp.float64)
    s1.run(10, dt=1e-3)

    p2 = prism_input(viscous)
    sh = ShardedSolver(p2, mesh, devices=jax.devices()[:4],
                       dtype=jnp.float64)
    assert sh.tables.n_halo > 0
    sh.run(10, dt=1e-3)
    np.testing.assert_allclose(sh.gather_u(), np.asarray(s1.u),
                               rtol=0, atol=1e-11)


def test_prism_only_mixed_path_fast_and_matches(capsys):
    """Pure-prism meshes ride the mixed per-face-shape machinery (round 5):
    MixedSolver and ShardedMixedSolver both engage a fast path (the
    single-type SoA layout cannot express prism tri+quad faces) and match
    the slot-path Solver to roundoff."""
    from hifiles_tpu.parallel.mixed_sharding import ShardedMixedSolver
    from hifiles_tpu.solver.multiblock import MixedSolver

    mesh = periodic_prism_mesh(2, 2, 2)
    s1 = Solver(prism_input(1), mesh, dtype=jnp.float64)
    s1.run(5, dt=1e-3)
    u1 = np.asarray(s1.u)

    sm = MixedSolver(prism_input(1), periodic_prism_mesh(2, 2, 2),
                     dtype=jnp.float64)
    assert sm.run_path == "mixed-SoA (fast)", sm.run_path
    sm.run(5, dt=1e-3)
    sel = sm.mt.sels[sm.cts[0]]
    np.testing.assert_allclose(np.asarray(sm.u[0]), u1[sel],
                               rtol=0, atol=1e-12)

    sh = ShardedMixedSolver(prism_input(1), periodic_prism_mesh(2, 2, 2),
                            devices=jax.devices()[:4], dtype=jnp.float64)
    assert sh.run_path.startswith("sharded mixed SoA"), sh.run_path
    sh.run(5, dt=1e-3)
    np.testing.assert_allclose(np.asarray(sh.gather_u()[0]), u1[sh.sels[3]],
                               rtol=0, atol=1e-12)


def test_driver_routes_pure_prism_to_mixed():
    """The driver's dispatch predicate sends prism-only meshes down the
    mixed path (driver.py routing, round 5)."""
    from hifiles_tpu import PRISM

    mesh = periodic_prism_mesh(2, 2, 2)
    cts_present = np.unique(mesh.ctype)
    assert cts_present.size == 1 and int(cts_present[0]) == PRISM
