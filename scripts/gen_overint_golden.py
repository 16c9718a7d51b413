#!/usr/bin/env python3
"""Reference-binary golden for polynomial de-aliasing (over_int — the
BASELINE config #3 feature): TGV-like 8^3 periodic hex box, p=3,
over_int_order=5, 25 RK45 steps (tests/decks/input_tgv8_overint_25).

Prints the iter-25 monitor row — the golden for
tests/test_regression_reference.py::test_overint_reference_golden.
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
from hifiles_tpu.mesh.generate import periodic_hex_mesh  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/overint_ref"
BIN = "/tmp/refsrc/bin/HiFiLES"


def main():
    os.makedirs(WORK, exist_ok=True)
    mesh = periodic_hex_mesh(8, 8, 8)
    write_gambit(mesh, os.path.join(WORK, "hex8_box.neu"))
    shutil.copy(os.path.join(REPO, "tests/decks/input_tgv8_overint_25"),
                os.path.join(WORK, "input_tgv8_overint_25"))
    env = dict(os.environ,
               LD_LIBRARY_PATH="/tmp/cblas_shim",
               HIFILES_HOME="/root/reference")
    r = subprocess.run([BIN, "input_tgv8_overint_25"], cwd=WORK, env=env,
                       capture_output=True, text=True, timeout=3600)
    sys.stdout.write(r.stdout[-3000:])
    sys.stderr.write(r.stderr[-2000:])


if __name__ == "__main__":
    main()
