#!/usr/bin/env python3
"""Measure the reference binary on the channel bench case (the
per-config vs_baseline denominator for bench.py config "channel").

Protocol matches REFERENCE_BASELINE.json per_config_description: same
OpenBLAS build (scripts/build_reference.sh -> /tmp/refsrc/bin/HiFiLES),
12-minus-2-step 'Execution time' differencing.  The case is the shipped
tests/decks/input_channel_les_bench deck on the bench's 16^3 hex channel
mesh (body-forced Smagorinsky LES + 5-field time averaging; the
reference hard-codes the periodic-hill forcing constants at
ref:src/eles.cpp:5393-5395, which changes the forcing magnitude but not
the per-step work, so the throughput comparison is apples-to-apples).

Usage: python scripts/measure_reference_channel.py
"""

import os
import re
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/channel_ref"
BIN = "/tmp/refsrc/bin/HiFiLES"


def run_steps(n_steps):
    deck_src = os.path.join(REPO, "tests/decks/input_channel_les_bench")
    deck = open(deck_src).read()
    deck = re.sub(r"n_steps\s+\d+", f"n_steps    {n_steps}", deck)
    path = os.path.join(WORK, "input_channel")
    with open(path, "w") as f:
        f.write(deck)
    env = dict(os.environ,
               LD_LIBRARY_PATH="/tmp/cblas_shim",
               HIFILES_HOME="/root/reference",
               OPENBLAS_NUM_THREADS="1")
    r = subprocess.run([BIN, "input_channel"], cwd=WORK, env=env,
                       capture_output=True, text=True, timeout=3600)
    m = re.search(r"Execution time= *([0-9.]+)", r.stdout)
    assert m, r.stdout[-3000:] + r.stderr[-2000:]
    return float(m.group(1))


def main():
    from hifiles_tpu.mesh.gambit import write_gambit
    from hifiles_tpu.mesh.generate import channel_hex_mesh

    os.makedirs(WORK, exist_ok=True)
    mesh = channel_hex_mesh(16, 16, 16)
    write_gambit(mesh, os.path.join(WORK, "channel_hex.neu"))

    t2 = run_steps(2)
    t12 = run_steps(12)
    sec_per_step = (t12 - t2) / 10.0
    dof = mesh.n_cells * 125            # p=4 hexes
    rate = dof * 5 / sec_per_step       # RK45, 5 stages
    print(f"t2={t2:.3f}s t12={t12:.3f}s -> {sec_per_step:.3f} s/step, "
          f"DOF={dof}, rate={rate:.6g} DOF*stage/s")


if __name__ == "__main__":
    main()
