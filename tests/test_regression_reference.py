"""Golden-value regression against the reference solver binary.

This mirrors the reference's own regression harness
(ref:testcases/regression_tests.py:292-307): L1 residual norms of the
monitor row at iteration 25, tol=1e-5.  The golden values below were
MEASURED by building the reference (CMake Release, BLAS=NO) and running the
unmodified TGV deck on this host — the script's published numbers
[0.00013215, 0.05076817, ...] are stale: the fork's own binary does not
reproduce them either (it prints the values used here).

The monitored residual in the reference is the one computed by the *last RK
stage* of the step (div_tconf is left over from stage 5's CalcResidual,
ref:src/HiFiLES.cpp:201-218 + output.cpp:2166), so the final step is
replayed stage-by-stage here.
"""

import os

import numpy as np
import pytest

from hifiles_tpu.config.params import RunInput
from hifiles_tpu.mesh.gambit import read_gambit
from hifiles_tpu.solver.solver import Solver
from hifiles_tpu.solver.step import RK45_A, RK45_B

TGV_DIR = "/root/reference/testcases/navier-stokes/Taylor_Green_vortex"

# measured from the reference binary, iter-25 monitor row, 2026-08-16
TGV_GOLD = [0.00810359, 0.05676473, 0.05674665, 0.07418955, 2.01757042]


def last_stage_residual(solver, n_steps, dt):
    """Replicate n_steps of RK45, returning the stage-5 rhs of the last step
    (what the reference's residual monitor reports)."""
    import jax.numpy as jnp

    if n_steps > 1:
        solver.run(n_steps - 1, dt=dt)
    u, r = solver.u, solver.reg * 0.0
    rhs_last = None
    for s in range(5):
        rhs_last = solver.residual_fn(u)
        r = RK45_A[s] * r + dt * rhs_last
        u = u + RK45_B[s] * r
    solver.u = u
    return np.asarray(rhs_last)


@pytest.mark.skipif(not os.path.isdir(TGV_DIR), reason="reference absent")
def test_tgv_residual_regression():
    p = RunInput.from_deck(os.path.join(TGV_DIR, "input_TGV_SD_hex"))
    mesh = read_gambit(os.path.join(TGV_DIR,
                                    "Taylor-Green-Vortex-hex.neu"))
    s = Solver(p, mesh)
    rhs = last_stage_residual(s, 25, p.dt)
    res = s.residual_norm(norm_type=1, r=rhs)
    for mine, gold in zip(res, TGV_GOLD):
        assert abs(mine - gold) < 1e-5, (list(res), TGV_GOLD)
