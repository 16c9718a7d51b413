"""Config tests: the reference testcase decks must parse verbatim."""

import math
import os

import pytest

from hifiles_tpu.config import Deck, RunInput

REF_TC = "/root/reference/testcases"


def test_tgv_deck_parses():
    path = f"{REF_TC}/navier-stokes/Taylor_Green_vortex/input_TGV_SD_hex"
    if not os.path.exists(path):
        pytest.skip("reference testcases not available")
    p = RunInput.from_deck(path)
    assert p.equation == 0 and p.viscous == 1
    assert p.riemann_solve_type == 3           # hllc
    assert p.ic_form == 7 and p.order == 1
    assert p.adv_type == 3 and p.n_steps == 100
    assert p.mesh_file == "Taylor-Green-Vortex-hex.neu"
    assert p.integral_quantities == ["kineticenergy", "enstropy"]
    assert p.diagnostic_fields == ["vorticity", "q_criterion", "pressure", "mach"]
    # non-dimensionalization (ref:src/input.cpp:594-663)
    assert math.isclose(p.uvw_ref,
                        0.1 * math.sqrt(1.4 * 286.9 * 300.0), rel_tol=1e-12)
    assert math.isclose(p.rho_c_ic, 1.0, rel_tol=1e-12)   # rho_free == rho_c
    assert math.isclose(p.T_c_ic, 1.0, rel_tol=1e-12)
    assert math.isclose(p.uvw_c_ic / p.uvw_ref, 1.0, rel_tol=1e-12)
    # p_c_ic = rho R T / p_ref with p_ref = rho_ref uvw_ref^2
    p_dim = 0.0008421095852102401 * 286.9 * 300.0
    assert math.isclose(p.p_c_ic, p_dim / p.p_ref, rel_tol=1e-12)
    # dt non-dimensionalized by time_ref
    assert math.isclose(p.dt, 0.00001440389 / p.time_ref, rel_tol=1e-12)
    # dx_cyclic scaled by L_ref=1
    assert math.isclose(p.dx_cyclic, 2 * math.pi, rel_tol=1e-10)


def test_inviscid_cylinder_deck_parses():
    path = f"{REF_TC}/euler/cylinder/input_cylinder_inv"
    if not os.path.exists(path):
        pytest.skip("reference testcases not available")
    p = RunInput.from_deck(path)
    assert p.viscous == 0 and p.order == 3
    assert p.dt_type == 1 and math.isclose(p.CFL, 0.6)
    assert p.u_c_ic == 34.7128218      # inviscid: no non-dimensionalization
    assert p.p_c_ic == 101325.0
    # boundary params
    p.read_boundary_params(["far", "Slip_Wall"])
    assert p.bc_list[0].name == "far"
    from hifiles_tpu.config.params import CHAR, SLIP_WALL
    assert p.bc_list[0].flag == CHAR
    assert p.bc_list[1].flag == SLIP_WALL
    # CHAR bc computes rho & velocity from static state (ref:src/input.cpp:500-506)
    bc = p.bc_list[0]
    assert math.isclose(bc.rho, 101325.0 / (286.9 * 300.0), rel_tol=1e-12)
    a = math.sqrt(1.4 * 286.9 * 300.0)
    assert math.isclose(bc.velocity[0], 0.1 * a, rel_tol=1e-12)


def test_deck_first_match_wins_and_comments_ignored():
    d = Deck("""
----------------
order 3 // basis order
order 5
viscous 0
""")
    assert d.get_scalar("order", int) == 3
    assert d.get_scalar("missing", int, 7) == 7
    assert d.get_vector("novec") == []
