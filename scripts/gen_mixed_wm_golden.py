#!/usr/bin/env python3
"""Generate the BASELINE-config-#4 golden from the reference binary:
wall-modeled Smagorinsky LES on a mixed prism/tet channel
(tests/decks/input_prism_tet_wm_25).

Writes the channel_prism_tet_mesh(4,4,2,2) mesh as Gambit, runs the
reference binary (see memory: /tmp/refsrc/bin/HiFiLES + /tmp/cblas_shim),
and prints the iter-25 monitor residual row — the golden for
tests/test_mixed_wall_model.py::test_prism_tet_wm_reference_golden.
"""

import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from hifiles_tpu.mesh.gambit import write_gambit  # noqa: E402
from hifiles_tpu.mesh.generate import channel_prism_tet_mesh  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/prism_tet_ref"
BIN = "/tmp/refsrc/bin/HiFiLES"


def main():
    os.makedirs(WORK, exist_ok=True)
    mesh = channel_prism_tet_mesh(4, 4, 2, 2, x1=2.0, y1=1.0, z1=1.0)
    write_gambit(mesh, os.path.join(WORK, "prism_tet_channel.neu"))
    shutil.copy(os.path.join(REPO, "tests/decks/input_prism_tet_wm_25"),
                os.path.join(WORK, "input_prism_tet_wm_25"))
    env = dict(os.environ,
               LD_LIBRARY_PATH="/tmp/cblas_shim",
               HIFILES_HOME="/root/reference")
    r = subprocess.run([BIN, "input_prism_tet_wm_25"], cwd=WORK, env=env,
                       capture_output=True, text=True, timeout=3600)
    sys.stdout.write(r.stdout[-4000:])
    sys.stderr.write(r.stderr[-2000:])


if __name__ == "__main__":
    main()
