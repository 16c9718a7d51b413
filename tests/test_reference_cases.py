"""End-to-end run of a SHIPPED reference test case, deck + mesh unmodified
(except a shortened n_steps): euler/stube — Gmsh mesh, slip walls, Sod IC,
Persson sensor + exponential filter (ref:testcases/euler/stube)."""

import os
import shutil

import numpy as np
import pytest

CASE = "/root/reference/testcases/euler/stube"


@pytest.mark.skipif(not os.path.isdir(CASE), reason="reference not mounted")
def test_shipped_shock_tube_case(tmp_path, capsys):
    deck = open(os.path.join(CASE, "input_shock_tube")).read()
    deck = deck.replace("n_steps   5000", "n_steps   500")
    deck = deck.replace("plot_freq         5000", "plot_freq         500")
    (tmp_path / "input_shock_tube").write_text(deck)
    shutil.copy(os.path.join(CASE, "shock_tube101.msh"),
                tmp_path / "shock_tube101.msh")

    from hifiles_tpu.driver import main
    rc = main([str(tmp_path / "input_shock_tube"), "--f64",
               "--outdir", str(tmp_path)])
    assert rc == 0

    # reload the final state via the solver to check the physics
    from hifiles_tpu.config.params import RunInput
    from hifiles_tpu.mesh.gmsh import read_gmsh
    from hifiles_tpu.solver.solver import Solver
    p = RunInput.from_deck(str(tmp_path / "input_shock_tube"))
    mesh = read_gmsh(str(tmp_path / "shock_tube101.msh"))
    s = Solver(p, mesh)
    s.run(500, dt=p.dt)
    u = np.asarray(s.u, dtype=np.float64)
    assert np.isfinite(u).all()
    x = s.block.pos_upts[..., 0]
    rho = u[..., 0]
    # Sod at t=0.5 ms: left state intact far left, right state far right,
    # shock/contact in between; density bounded by the initial states
    assert abs(rho[x < 1.0].mean() - 1.0) < 1e-3
    assert abs(rho[x > 9.0].mean() - 0.125) < 1e-3
    assert rho.min() > 0.05 and rho.max() < 1.1
    # shock speed ~544 m/s -> front near x = 5.27 at t = 0.5 ms: passed
    # x = 5.15, not yet at x = 6
    mid = rho[(x > 5.05) & (x < 5.15)]
    assert mid.size and (mid > 0.14).all()
    assert abs(rho[(x > 6.0) & (x < 9.0)].mean() - 0.125) < 1e-2
    # ParaView output of the shipped case was produced
    assert (tmp_path / "shock_tube_000000500.pvtu").exists()
