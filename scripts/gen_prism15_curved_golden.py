#!/usr/bin/env python3
"""Generate the curved-quadratic-hex golden from the reference binary:
TGV-like viscous run on a periodic box of CURVED 20-node serendipity
hexes (tests/decks/input_prism15_curved_25) — cross-validates the
eval_nodal_s_basis 15-node branch (ref:src/eles_pris.cpp:1114-1181)
against mesh/shape.py's serendipity implementation through full
transforms, not just basis algebra.

Writes periodic_curved_prism15_mesh(3,3,3) as Gambit, runs the reference
binary (/tmp/refsrc/bin/HiFiLES, scripts/build_reference.sh), and prints
the iter-25 monitor residual row — the golden for
tests/test_regression_reference.py::test_prism15_curved_reference_golden.
"""

import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from hifiles_tpu.mesh.gambit import write_gambit  # noqa: E402
from hifiles_tpu.mesh.generate import periodic_curved_prism15_mesh  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/prism15_ref"
BIN = "/tmp/refsrc/bin/HiFiLES"


def main():
    os.makedirs(WORK, exist_ok=True)
    mesh = periodic_curved_prism15_mesh(3, 3, 3)
    write_gambit(mesh, os.path.join(WORK, "prism15_curved.neu"))
    shutil.copy(os.path.join(REPO, "tests/decks/input_prism15_curved_25"),
                os.path.join(WORK, "input_prism15_curved_25"))
    env = dict(os.environ,
               LD_LIBRARY_PATH="/tmp/cblas_shim",
               HIFILES_HOME="/root/reference")
    r = subprocess.run([BIN, "input_prism15_curved_25"], cwd=WORK, env=env,
                       capture_output=True, text=True, timeout=3600)
    sys.stdout.write(r.stdout[-4000:])
    sys.stderr.write(r.stderr[-2000:])


if __name__ == "__main__":
    main()
