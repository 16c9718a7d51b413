#!/usr/bin/env python3
"""Reference-binary golden for TET polynomial de-aliasing: periodic
3x3x3 tet box (162 tets), p=3, over_int_order=5, 25 RK45 steps
(tests/decks/input_tet_overint_25; the tet analog of
gen_overint_golden.py).  Prints the iter-25 monitor row — the golden for
tests/test_regression_reference.py::test_tet_overint_reference_golden.
See memory reference-binary-build for the /tmp/refsrc toolchain.
"""

import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from hifiles_tpu.mesh.gambit import write_gambit  # noqa: E402
from hifiles_tpu.mesh.generate import periodic_tet_mesh  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/tet_overint"
BIN = "/tmp/refsrc/bin/HiFiLES"


def main():
    os.makedirs(WORK, exist_ok=True)
    write_gambit(periodic_tet_mesh(3, 3, 3),
                 os.path.join(WORK, "tet_box.neu"))
    shutil.copy(os.path.join(REPO, "tests/decks/input_tet_overint_25"),
                os.path.join(WORK, "input_tet_overint_25"))
    env = dict(os.environ,
               LD_LIBRARY_PATH="/tmp/cblas_shim",
               HIFILES_HOME="/root/reference")
    r = subprocess.run([BIN, "input_tet_overint_25"], cwd=WORK, env=env,
                       capture_output=True, text=True, timeout=3600)
    sys.stdout.write(r.stdout[-2000:])
    sys.stderr.write(r.stderr[-1000:])


if __name__ == "__main__":
    main()
