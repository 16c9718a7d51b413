"""Face-major fast-path equivalence: the tile-friendly face-row-gather +
one-hot-rotation residual must match the per-slot reference path to
roundoff (residual.py BlockArrays.uniform)."""

import numpy as np
import pytest

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.generate import (channel_quad_mesh, periodic_hex_mesh,
                                       periodic_tet_mesh)
from hifiles_tpu.solver.residual import make_residual_fn
from hifiles_tpu.solver.solver import Solver


def tgv_input():
    p = RunInput()
    p.equation = 0
    p.viscous = 1
    p.order = 3
    p.ic_form = 7
    p.adv_type = 3
    p.riemann_solve_type = 3
    p.dt_type = 0
    p.n_steps = 0
    p.vcjh_scheme_hexa = 1
    p.dx_cyclic = p.dy_cyclic = p.dz_cyclic = 2 * np.pi
    p.gamma, p.R_gas, p.fix_vis = 1.4, 286.9, 1
    p.prandtl = 0.72
    p.Mach_free_stream, p.T_free_stream = 0.1, 300.0
    p.rho_free_stream = 0.0008421095852102401
    p.mu_gas = 1.827e-5
    p.L_free_stream = 1.0
    p.Mach_c_ic, p.T_c_ic, p.rho_c_ic = 0.1, 300.0, 0.0008421095852102401
    p.dt = 1.440389e-5
    p.setup_params()
    return p


def test_face_path_matches_slot_path_hex_viscous():
    p = tgv_input()
    s = Solver(p, periodic_hex_mesh(4, 4, 4))
    assert s.residual_fn.__name__ == "residual_face"
    r_face = np.asarray(s.residual_fn(s.u))
    r_slot = np.asarray(make_residual_fn(s.block, s.rcfg, s.dtype, None,
                                         face_path=False)(s.u))
    scale = np.abs(r_slot).max()
    assert np.abs(r_face - r_slot).max() < 1e-10 * max(scale, 1.0)


def test_face_path_matches_slot_path_tet_inviscid():
    p = tgv_input()
    p.viscous = 0
    p.mu_inf = float("nan")
    s = Solver(p, periodic_tet_mesh(2, 2, 2))
    assert s.residual_fn.__name__ == "residual_face"
    r_face = np.asarray(s.residual_fn(s.u))
    r_slot = np.asarray(make_residual_fn(s.block, s.rcfg, s.dtype, None,
                                         face_path=False)(s.u))
    scale = np.abs(r_slot).max()
    assert np.abs(r_face - r_slot).max() < 1e-10 * max(scale, 1.0)


def test_face_path_matches_slot_path_with_boundaries():
    """Quad channel with inflow/outflow/cyclic groups exercises the
    boundary rows of the face-major fn concatenation."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_turb_inlet import les_channel_input
    from hifiles_tpu.solver.bc import make_bc_functions
    p = les_channel_input(inlet_type=0)
    p.LES = 0
    s = Solver(p, channel_quad_mesh(8, 4, 0.0, 2.0, 0.0, 1.0))
    assert s.residual_fn.__name__ == "residual_face"
    # perturb away from the trivial freestream so BC rows matter
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    u = s.u * (1.0 + 0.01 * jnp.asarray(
        rng.random(np.asarray(s.u).shape), s.dtype))
    bc = make_bc_functions(p, s.block, s.rcfg, s.dtype)
    r_face = np.asarray(s.residual_fn(u))
    r_slot = np.asarray(make_residual_fn(s.block, s.rcfg, s.dtype, bc,
                                         face_path=False)(u))
    scale = np.abs(r_slot).max()
    assert np.abs(r_face - r_slot).max() < 1e-10 * max(scale, 1.0)


def test_prism_falls_back_to_slot_path():
    from hifiles_tpu.mesh.generate import periodic_prism_mesh
    p = tgv_input()
    p.viscous = 0
    p.mu_inf = float("nan")
    s = Solver(p, periodic_prism_mesh(2, 2, 2))
    # prisms mix tri and quad faces -> non-uniform nfp -> slot path
    assert s.residual_fn.__name__ == "residual"
    r = np.asarray(s.residual_fn(s.u))
    assert np.isfinite(r).all()


def test_field_major_residual_matches(monkeypatch):
    """The opt-in field-major (E,F,U) residual is numerically identical to
    the face path (kept for layout experiments; measured slower on v5e)."""
    import jax.numpy as jnp
    monkeypatch.setenv("HIFILES_FM", "1")
    p = tgv_input()
    s = Solver(p, periodic_hex_mesh(3, 3, 3))
    assert s.residual_fm is not None
    r_aos = np.asarray(s.residual_fn(s.u))
    ufm = jnp.transpose(s.u, (0, 2, 1))
    r_fm = np.transpose(np.asarray(s.residual_fm(ufm)), (0, 2, 1))
    scale = np.abs(r_aos).max()
    assert np.abs(r_aos - r_fm).max() < 1e-10 * max(scale, 1.0)
