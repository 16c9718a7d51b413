#!/usr/bin/env python3
"""Headline benchmark suite.

Default (`python bench.py`): runs EVERY flagship configuration — the
BASELINE.json TGV p=4 hex case plus each feature-physics variant and the
mixed tri+quad case — each with its own f32 accuracy gate, and prints ONE
JSON line whose headline numbers are the plain config with a "configs"
map recording every per-config gated rate:

  {"metric": ..., "value": N, "unit": "DOF*RK-stage/s", "vs_baseline": N,
   "gated": true, "configs": {"plain": {...}, "overint": {...}, ...}}

vs_baseline compares against the reference CPU solver's measured per-device
rate on the same case when REFERENCE_BASELINE.json is present (the reference
publishes no throughput numbers, SURVEY.md §6), else reports 0.

BENCH_CONFIG selects a single configuration instead of the full suite:
  plain   viscous NS + HLLC (TGV p=4 hex 16^3)
  overint polynomial de-aliasing (over_int_order = p + 2)
  smag    LES Smagorinsky SGS
  shock   Persson shock capture + exp filter + RoeM
  rans    SA-RANS 6-field pipeline + source (Rusanov)
  mixed   2-D tri+quad 13824-cell vortex p=4 (per-type SoA blocks)
  mixed3d 3-D prism/tet wall-modeled LES channel (BASELINE #4 twin)
  channel body-forced plane-channel LES + time averages (featured chunk)
Non-default BENCH_ORDER/MESH/STEPS runs are UNGATED (plain config only):
the JSON reports "gated": false and a notice goes to stderr.

BENCH_TIMED_STEPS (default 100) sets the steps per timed dispatch; the
rate is min-of-3 repeats of one run() call.  The accuracy gate always
checks the state after warmup + BENCH_STEPS regardless.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# f32 L1 residual rows after 10+10 steps (CPU goldens; see
# scripts/gen_bench_goldens.py).  rho/energy entries are
# cancellation-sensitive in f32 (the plain f64 row is
# [6.7475e-4, 4.96598e-2, 4.96598e-2, 6.38773e-2, 1.12159e-1], ~4% off in
# those fields); platform-to-platform f32 spread is ~1e-3, so runs on a
# platform with no same-platform golden gate at 5e-3 (GATE_RTOL below);
# same-platform runs gate at SAME_PLATFORM_RTOL = 5e-4.  The monitor
# norm accumulates in f64 (solver.residual_norm), so the row is exact
# for the device residual.
# regenerated 2026-08-20 (round 5, gen_bench_goldens.py on CPU f32): the
# monitor row now flows through the SoA residual (_monitor_residual)
GOLDENS = {
    "plain": [6.941142790690e-04, 4.966159536118e-02, 4.966221268805e-02,
              6.388034231193e-02, 1.170654706372e-01],
    "overint": [7.041802843269e-04, 4.966480296847e-02, 4.966359326116e-02,
                6.388326561503e-02, 1.196348554410e-01],
    "smag": [6.915991758127e-04, 4.965766590876e-02, 4.965743605242e-02,
             6.388290707427e-02, 1.164381646750e-01],
    # s0=0 fires the exp filter everywhere: rows are large by construction
    "shock": [1.088646796180e+00, 7.200999302322e+00, 7.201000897436e+00,
              2.065917861886e-01, 2.723697619697e+02],
    # SA-RANS 6-field pipeline + source (Rusanov; no walls on the box —
    # nu_tilde seeded at the free-stream level so the SA terms and the
    # 6th residual row are live)
    "rans": [6.932668879263e-04, 4.965675295157e-02, 4.965730678584e-02,
             6.387954113683e-02, 1.166911509066e-01, 3.304107737779e-04],
    # mixed tri+quad viscous vortex p=4 96x96
    "mixed": [6.740825334323e-03, 2.244257251877e-02, 2.264023451759e-02,
              3.971234396777e-02],
    # 3-D prism/tet wall-modeled LES channel (TGV ic_form 7 so the row is
    # physics-scale, not platform rounding noise)
    "mixed3d": [3.131947323206e+00, 1.117830214485e+01, 1.913928947338e+01,
                8.074575550287e-01, 1.966135718009e+02],
    # body-forced plane-channel LES + time averages (uniform IC on no-slip
    # walls, so the rows are wall-layer physics scale — the wall-damped
    # Smagorinsky stress dominates)
    "channel": [1.626676051504e-02, 7.708719019215e-01, 1.982168968139e-01,
                2.859064812405e-04, 1.132711735533e+00],
}

# TPU-measured goldens (v5e, HIGHEST precision, 2026-08-18): the same
# warmup+10-step protocol recorded on the real chip.  Gating each
# platform against its own golden removes the TPU-vs-CPU f32 spread
# (up to 1.37e-2 on overint's cancellation-sensitive rows) from the
# tolerance budget, so the gate can sit at 5e-4 instead of 5e-3/2e-2
# and still only trips on real drift.  Regenerate by running
# BENCH_RECORD=1 python bench.py on the target platform.
# re-recorded 2026-08-20 (BENCH_RECORD, round 5): the monitor row is now
# computed through the SoA residual (solver._monitor_residual) — same
# physics, different f32 summation order than the slot-path rows the
# previous goldens pinned (shift ~2e-5 rel, up to 2.5e-3 on the channel's
# near-zero z-momentum row)
GOLDENS_TPU = {
    "plain": [6.949735673879e-04, 4.966198057769e-02, 4.966101962714e-02,
              6.388117023008e-02, 1.172970028530e-01],
    "overint": [6.979981273080e-04, 4.966085043584e-02, 4.966074388150e-02,
                6.388130737059e-02, 1.180668683294e-01],
    "smag": [6.925179191086e-04, 4.965825700187e-02, 4.965759059517e-02,
             6.388339976516e-02, 1.166791655597e-01],
    "shock": [1.088646168097e+00, 7.201012298852e+00, 7.201012202789e+00,
              2.066031250971e-01, 2.723700508618e+02],
    "rans": [6.945669624039e-04, 4.965719437426e-02, 4.965764100490e-02,
             6.387949242290e-02, 1.170028416629e-01, 3.304062096759e-04],
    "mixed": [6.738992088695e-03, 2.243990854544e-02, 2.263975481923e-02,
              3.970552726035e-02],
    "mixed3d": [3.131947179463e+00, 1.117830318664e+01, 1.913928931750e+01,
                8.074621039642e-01, 1.966135678869e+02],
    # z-momentum row sits at 2.7e-4 — near-zero physics in a plane
    # channel — where the CPU row reads 2.3e-4, an 18% cross-platform
    # f32 spread that the same-platform golden removes from the budget
    "channel": [1.625666954457e-02, 7.722186964330e-01, 1.985179263045e-01,
                2.730191507782e-04, 1.132313307788e+00],
}

# Per-config gate tolerance for rows checked against the OTHER
# platform's golden (CPU golden, TPU run or vice versa): overint's extra
# large HIGHEST contractions (solution->over-int cubature, L2 project
# back) amplify the cross-platform f32 spread on the
# cancellation-sensitive rho/energy rows to 1.37e-2 (measured
# 2026-08-17).  Real corruption moves these rows by >>10%
# (BENCH_PRECISION=high: 3.8x).  Same-platform goldens gate at
# SAME_PLATFORM_RTOL instead.  (mixed3d's former 1e-2 entry retired
# round 5: the TPU golden above covers the only non-CPU platform.)
GATE_RTOL = {"overint": 2e-2}
SAME_PLATFORM_RTOL = 5e-4

# plain (the headline) first, then the two configs that had never been
# driver-captured before round 5 (mixed3d, channel), so a driver timeout
# still records the numbers that matter most; the cumulative JSON line
# printed after EVERY config makes any prefix a valid record.
ALL_CONFIGS = ["plain", "mixed3d", "channel", "mixed", "overint", "smag",
               "shock", "rans"]


def configure(p, cfg_name):
    """Apply the BENCH_CONFIG feature physics to the TGV deck."""
    if cfg_name == "plain":
        return
    if cfg_name == "overint":
        p.over_int = 1
        p.over_int_order = p.order + 2
    elif cfg_name == "smag":
        p.LES, p.SGS_model = 1, 0
        p.C_s, p.filter_ratio, p.filter_type = 0.1, 2.0, 2
    elif cfg_name == "shock":
        p.shock_cap, p.s0 = 1, 0.0     # filter fires everywhere: worst case
        p.riemann_solve_type = 2       # RoeM (BASELINE #5 pairing)
    elif cfg_name == "rans":
        p.RANS = 1                     # SA: 6-field pipeline + source
        p.riemann_solve_type = 0       # Rusanov (HLLC invalid with RANS,
        #                                ref:src/input.cpp analog)
    else:
        raise SystemExit(f"unknown BENCH_CONFIG '{cfg_name}'")


def mixed_input():
    """2-D viscous isentropic vortex, p=4 — the mixed flagship deck
    (matches scripts/gen_bench_goldens.py golden protocol)."""
    from hifiles_tpu.config.params import RunInput
    p = RunInput()
    p.equation, p.viscous, p.order = 0, 1, 4
    p.ic_form, p.test_case, p.adv_type = 0, 1, 3
    p.riemann_solve_type = 3           # HLLC
    p.dt_type, p.dt = 0, 1e-4
    p.mach_free_stream = 0.3
    p.dx_cyclic = p.dy_cyclic = 20.0
    p.mu_inf, p.rt_inf, p.c_sth = 1e-4, 1.0, 0.0
    p.fix_vis, p.prandtl = 1, 0.72
    return p


# featured-chunk carry (Solver "non-simple" runs: SEM inlet / ramp /
# forcing / time averages) — snapshot these along with (u, reg, time) so
# the timed repeats and the gate rerun start from identical state
_FEATURED_ATTRS = ("_iter_k", "_ti_state", "_mdot_old", "_t_sim", "u_avg")


def _snapshot(s):
    import jax
    import jax.numpy as jnp
    copy = lambda t: jax.tree.map(jnp.copy, t)
    extra = {a: copy(getattr(s, a)) for a in _FEATURED_ATTRS
             if getattr(s, a, None) is not None}
    return copy(s.u), copy(s.reg), s.time, extra


def _restore(s, snap):
    """Write device COPIES back (the run chunk donates its inputs, so the
    snapshot itself must survive for the next restore)."""
    import jax
    import jax.numpy as jnp
    copy = lambda t: jax.tree.map(jnp.copy, t)
    u_w, reg_w, t_w, extra = snap
    s.u, s.reg, s.time = copy(u_w), copy(reg_w), t_w
    for a, v in extra.items():
        setattr(s, a, copy(v))
    jax.block_until_ready((s.u, s.reg))


def _time_and_gate(s, run, dof, n_stages, n_steps, dt, residual_row,
                   cfg_name, gated_sizes):
    """Shared protocol: warmup n_steps, timed chunk min-of-3, then reset
    and gate the state after exactly warmup + n_steps steps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    run(n_steps, dt)             # warmup: compiles the n_steps-chunk (the
    jax.block_until_ready(s.u)   # ONLY executable this protocol compiles)
    snap = _snapshot(s)

    # timed chunk: ~BENCH_TIMED_STEPS (default 100) steps as back-to-back
    # ASYNC dispatches of the already-compiled n_steps chunk, min of 3
    # repeats.  Dispatches queue on the device without a host round trip,
    # so the ~33 ms axon-tunnel sync (measured; a 10-step chunk synced
    # per-dispatch would report 36% tunnel latency, not solver speed) is
    # paid ONCE per repeat at block_until_ready — and reusing the warmup
    # executable removes the second large XLA compile per config that
    # timed out the round-4 driver run (BENCH_r04.json rc=124).
    t_steps = int(os.environ.get("BENCH_TIMED_STEPS", 100))
    n_disp = max(1, t_steps // n_steps)
    wall = float("inf")
    for _ in range(3):
        _restore(s, snap)
        t0 = time.perf_counter()
        for _ in range(n_disp):
            run(n_steps, dt)
        jax.block_until_ready(s.u)
        wall = min(wall, time.perf_counter() - t0)
    rate = dof * n_stages * n_disp * n_steps / wall

    # gate state: exactly warmup + n_steps (the golden's 2 x 10 steps)
    _restore(s, snap)
    run(n_steps, dt)
    for a in jax.tree.leaves(s.u):
        assert np.isfinite(np.asarray(a)).all(), \
            "NaN/Inf in benchmark solution"

    on_cpu = jax.devices()[0].platform == "cpu"
    same_plat = (not on_cpu) and cfg_name in GOLDENS_TPU
    gold = (GOLDENS_TPU if same_plat else GOLDENS).get(cfg_name)
    gated = gated_sizes and gold is not None
    if gated:
        gold = np.array(gold)
        res = np.asarray(residual_row())[:len(gold)]
        if os.environ.get("BENCH_RECORD") or not (same_plat or on_cpu):
            # always surface the measured row when gating against the
            # OTHER platform's golden, so the per-round driver log carries
            # the row needed to pin a same-platform golden later
            row = ", ".join(f"{v:.12e}" for v in res)
            print(f"bench RECORD {cfg_name}: [{row}]", file=sys.stderr)
        rel = np.abs(res - gold) / gold
        rtol = (SAME_PLATFORM_RTOL if same_plat or on_cpu
                else GATE_RTOL.get(cfg_name, 5e-3))
        assert rel.max() < rtol or os.environ.get("BENCH_RECORD"), (
            f"benchmark accuracy drift vs f32 golden ({cfg_name}): "
            f"{list(res)} vs {list(gold)} (rel {rel.max():.2e})")
    else:
        print(f"bench: accuracy gate SKIPPED for config={cfg_name} "
              f"(no golden for these sizes)", file=sys.stderr)
    return rate, bool(gated)


def run_tgv(cfg_name):
    """TGV p=4 hex 16^3 (BASELINE.json flagship) + feature variants."""
    import jax.numpy as jnp
    import numpy as np

    from hifiles_tpu.config.params import RunInput
    from hifiles_tpu.mesh.generate import periodic_hex_mesh
    from hifiles_tpu.solver.solver import Solver

    order = int(os.environ.get("BENCH_ORDER", 4))
    n1 = int(os.environ.get("BENCH_MESH", 16))
    n_steps = int(os.environ.get("BENCH_STEPS", 10))

    # TGV deck parameters (testcases/navier-stokes/Taylor_Green_vortex)
    p = RunInput()
    p.equation = 0
    p.viscous = 1
    p.order = order
    p.ic_form = 7
    p.adv_type = 3           # RK45, 5 stages
    p.riemann_solve_type = 3  # HLLC
    p.dt_type = 0
    p.n_steps = n_steps
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
    configure(p, cfg_name)   # BEFORE setup_params: RANS ICs + validation
    p.setup_params()

    mesh = periodic_hex_mesh(n1, n1, n1)
    # MXU pass count for f32 contractions: highest (default, ~6 bf16
    # passes) or high (3 passes); the accuracy gate below arbitrates
    precision = os.environ.get("BENCH_PRECISION", "highest")
    s = Solver(p, mesh, dtype=jnp.float32, precision=precision)
    if cfg_name == "rans":
        # the TGV IC leaves nu_tilde 0 (matching the reference's set_ics);
        # seed the free-stream level so SA production/diffusion/destruction
        # are live and the 6-row gate covers them
        s.u = s.u.at[..., -1].set(p.mu_tilde_inf)

    dof = mesh.n_cells * (order + 1) ** 3
    gated_sizes = (order == 4 and n1 == 16 and n_steps == 10)
    rate, gated = _time_and_gate(
        s, lambda n, dt: s.run(n, dt=dt), dof, 5, n_steps, p.dt,
        lambda: s.residual_norm(norm_type=1), cfg_name, gated_sizes)
    suffix = "" if cfg_name == "plain" else f" +{cfg_name}"
    return dict(metric=f"TGV p={order} hex {n1}^3 viscous NS{suffix} "
                       "DOF*RK-stage/s",
                value=rate, gated=gated)


def run_mixed():
    """Mixed tri+quad flagship: 13824-cell periodic box, p=4 viscous
    vortex + HLLC through the per-type SoA fast path
    (solver/residual_mixed_soa.py; BASELINE configs #2/#4 layout)."""
    import jax.numpy as jnp

    from hifiles_tpu.mesh.generate import periodic_mixed_mesh_2d
    from hifiles_tpu.solver.multiblock import MixedSolver

    p = mixed_input()
    mesh = periodic_mixed_mesh_2d(96, 96, -10, 10, -10, 10)
    s = MixedSolver(p, mesh, dtype=jnp.float32)
    assert s.residual_soa is not None, \
        "mixed SoA fast path did not engage on the flagship mixed config"
    dof = sum(b.n_eles * b.ops.n_upts for b in s.blocks.values())
    rate, gated = _time_and_gate(
        s, lambda n, dt: s.run(n, dt=dt), dof, 5, 10, p.dt,
        lambda: s.residual_norm(norm_type=1), "mixed", True)
    return dict(metric="mixed tri+quad 13824c p=4 viscous vortex "
                       "DOF*RK-stage/s",
                value=rate, gated=gated)


def run_mixed3d():
    """3-D prism/tet wall-modeled LES channel — the reduced twin of
    BASELINE config #4 (SD7003 prism-near-wall/tet-above ILES,
    ref:testcases/navier-stokes/readme.txt:42-77): Smagorinsky SGS +
    Werner-Wengle wall model on the per-type mixed SoA path, cross-type
    tri faces at the prism/tet interface, run from the shipped
    reference-format deck."""
    import jax.numpy as jnp

    from hifiles_tpu.config.params import RunInput
    from hifiles_tpu.mesh.generate import channel_prism_tet_mesh
    from hifiles_tpu.solver.multiblock import MixedSolver

    # the bench deck is the reference-golden wm deck with the TGV IC
    # (ic_form 7) so the gate row is physics-scale, not rounding noise
    deck = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "decks", "input_prism_tet_wm_bench")
    p = RunInput.from_deck(deck)
    mesh = channel_prism_tet_mesh(32, 32, 4, 4, x1=2.0, y1=1.0, z1=1.0)
    s = MixedSolver(p, mesh, dtype=jnp.float32)
    assert s.residual_soa is not None, \
        "mixed SoA fast path did not engage on the mixed3d config"
    assert s._wm_tables is not None
    dof = sum(b.n_eles * b.ops.n_upts for b in s.blocks.values())
    rate, gated = _time_and_gate(
        s, lambda n, dt: s.run(n, dt=dt), dof, 5, 10, p.dt,
        lambda: s.residual_norm(norm_type=1), "mixed3d", True)
    return dict(metric="mixed prism/tet 8192p+24576t p=2 wall-modeled "
                       "LES DOF*RK-stage/s",
                value=rate, gated=gated)


def run_channel():
    """Body-forced plane-channel LES with running time averages — the
    reference's bread-and-butter LES production configuration
    (ref:src/eles.cpp:5281-5484 evaluate_body_force, :5630-5700
    CalcTimeAverageQuantities): Smagorinsky SGS + bulk-momentum forcing +
    5-field time averaging on resolved no-slip walls, cyclic x/z, run
    from the shipped reference-format deck through the "SoA featured
    (fast)" chunk (solver/solver.py)."""
    import jax.numpy as jnp

    from hifiles_tpu.config.params import RunInput
    from hifiles_tpu.mesh.generate import channel_hex_mesh
    from hifiles_tpu.solver.solver import Solver

    deck = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "decks", "input_channel_les_bench")
    p = RunInput.from_deck(deck)
    mesh = channel_hex_mesh(16, 16, 16)
    s = Solver(p, mesh, dtype=jnp.float32)
    assert s.run_path == "SoA featured (fast)", s.run_path
    assert s._forcing and s._avg
    dof = mesh.n_cells * (p.order + 1) ** 3
    rate, gated = _time_and_gate(
        s, lambda n, dt: s.run(n, dt=dt), dof, 5, 10, p.dt,
        lambda: s.residual_norm(norm_type=1), "channel", True)
    return dict(metric="forced-channel LES 16^3 p=4 +averaging "
                       "DOF*RK-stage/s",
                value=rate, gated=gated)


def main():
    from hifiles_tpu.utils import enable_persistent_cache
    enable_persistent_cache()

    custom_sizes = any(os.environ.get(k) for k in
                       ("BENCH_ORDER", "BENCH_MESH", "BENCH_STEPS"))
    sel = os.environ.get("BENCH_CONFIG", "plain" if custom_sizes else "all")
    names = ALL_CONFIGS if sel == "all" else [sel]

    ref = {}
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "REFERENCE_BASELINE.json")
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)

    def emit(results):
        """Cumulative JSON record for the configs finished SO FAR, printed
        after every config so a driver timeout still leaves a parsed
        record of everything that completed (round-4 lost the whole run
        to a single end-of-suite print, BENCH_r04.json parsed=null)."""
        head = results.get("plain", next(iter(results.values())))
        per_cfg = ref.get("per_config_dof_stage_per_s", {})
        vs_baseline = 0.0
        base = ref.get("tgv_p4_hex_dof_stage_per_s", 0.0)
        if base and "plain" in results:
            vs_baseline = results["plain"]["value"] / base
        elif len(results) == 1:
            base_k = per_cfg.get(next(iter(results)))
            if base_k:
                vs_baseline = head["value"] / base_k
        out = {"metric": head["metric"], "value": head["value"],
               "unit": "DOF*RK-stage/s", "vs_baseline": vs_baseline,
               "gated": all(r["gated"] for r in results.values())}
        if len(names) > 1:
            # per-config vs_baseline: the reference binary measured with
            # the same feature flags / same case (REFERENCE_BASELINE.json
            # per_config_dof_stage_per_s, 12-minus-2-step differencing)
            out["configs"] = {
                k: {"value": v["value"], "gated": v["gated"],
                    **({"vs_baseline": v["value"] / per_cfg[k]}
                       if per_cfg.get(k) else {})}
                for k, v in results.items()}
            out["configs_done"] = f"{len(results)}/{len(names)}"
        print(json.dumps(out), flush=True)

    results = {}
    for name in names:
        t0 = time.perf_counter()
        r = (run_mixed() if name == "mixed" else
             run_mixed3d() if name == "mixed3d" else
             run_channel() if name == "channel" else run_tgv(name))
        results[name] = r
        print(f"bench[{name}]: {r['value']:.4e} DOF*stage/s "
              f"(gated={r['gated']}, {time.perf_counter() - t0:.0f}s)",
              file=sys.stderr, flush=True)
        emit(results)


if __name__ == "__main__":
    main()
