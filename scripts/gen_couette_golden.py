#!/usr/bin/env python3
"""Generate the Couette-flow error.dat golden from the reference binary
(test_case 5, ref:src/eles.cpp:5222-5245 + funcs.cpp:1830-1922).

Builds a 4x4 quad channel with our write_gambit (x-cyclic, isothermal
moving top wall + fixed bottom wall), copies tests/decks/input_couette_50
next to it, and runs the reference binary rebuilt in round 2
(/tmp/refsrc/bin/HiFiLES_blas + /tmp/cblas_shim, see memory notes).

The error.dat row is: sol L2 (4 fields), grad L2 (4 fields) — the golden
for tests/test_regression_reference.py::test_couette_error_parity.
"""

import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force CPU (axon sitecustomize starts a TPU backend)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.extend.backend.clear_backends()
except Exception:
    pass

from hifiles_tpu.mesh.gambit import write_gambit  # noqa: E402
from hifiles_tpu.mesh.generate import ywall_channel_quad_mesh  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/couette_ref"
BIN = "/tmp/refsrc/bin/HiFiLES_blas"


def main():
    os.makedirs(WORK, exist_ok=True)
    mesh = ywall_channel_quad_mesh(4, 4, 0.0, 2.0, 0.0, 1.0,
                                   bc_ymin="Isotherm_Fix",
                                   bc_ymax="Isotherm_Mov")
    write_gambit(mesh, os.path.join(WORK, "quad_couette.neu"))
    shutil.copy(os.path.join(REPO, "tests/decks/input_couette_50"),
                os.path.join(WORK, "input_couette_50"))
    env = dict(os.environ,
               LD_LIBRARY_PATH="/tmp/cblas_shim",
               HIFILES_HOME="/root/reference")
    r = subprocess.run([BIN, "input_couette_50"], cwd=WORK, env=env,
                       capture_output=True, text=True, timeout=1800)
    sys.stdout.write(r.stdout[-3000:])
    sys.stderr.write(r.stderr[-2000:])
    err_path = os.path.join(WORK, "error.dat")
    if os.path.exists(err_path):
        print("error.dat:")
        print(open(err_path).read())


if __name__ == "__main__":
    main()
