"""Solver orchestration: config + mesh -> jitted time stepping + diagnostics.

The TPU-native analog of the reference driver (ref:src/HiFiLES.cpp:41-343):
setup happens once on the host in numpy; the time loop is a jitted
``lax.scan`` over fused RK steps on device.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import HEX, PRISM, QUAD, TET, TRI
from ..config.params import RunInput
from ..mesh.core import FaceConnectivity, MeshData, build_faces
from ..models.euler import max_wavespeed
from ..ops.operators import build_tensor_ops
from .elements import ElementBlock, build_element_block
from .ics import analytic_solution, initial_condition
from .residual import ResidualConfig, make_residual_fn
from .step import N_STAGES, make_step_fn


class Solver:
    """Single-element-type, single-device solver (multi-chip via
    parallel/sharding.py wraps this)."""

    def __init__(self, run_input: RunInput, mesh: MeshData,
                 dtype=jnp.float64, fused: bool = True,
                 precision: str = "highest"):
        from ..utils import enable_persistent_cache
        enable_persistent_cache()
        self.p = run_input
        self.mesh = mesh
        self.dtype = dtype
        self.n_dims = mesh.n_dims
        self.n_fields = run_input.n_fields_for(self.n_dims)

        # boundary flags: group id -> BCFLAG (ref:src/mesh_reader.cpp:299-393
        # builds bc_list from the mesh's boundary group names)
        if (mesh.bc_names and not run_input.bc_list
                and run_input._deck is not None):
            run_input.read_boundary_params(mesh.bc_names)
        if run_input.bc_list:
            bc_flags = {i: bc.flag for i, bc in enumerate(run_input.bc_list)}
        else:
            # built-in periodic meshes declare a single Cyclic group
            from ..config.params import CYCLIC
            bc_flags = {0: CYCLIC}
        delta_cyclic = np.array([run_input.dx_cyclic, run_input.dy_cyclic,
                                 run_input.dz_cyclic])[:self.n_dims]

        self.conn = build_faces(mesh, bc_flags, delta_cyclic)

        ctype = int(mesh.ctype[0])
        if ctype == QUAD:
            ops = build_tensor_ops(
                QUAD, run_input.order, run_input.upts_type_quad,
                run_input.vcjh_scheme_quad, run_input.eta_quad)
        elif ctype == HEX:
            ops = build_tensor_ops(
                HEX, run_input.order, run_input.upts_type_hexa,
                run_input.vcjh_scheme_hexa, run_input.eta_hexa)
        elif ctype == TRI:
            from ..ops.operators import build_tri_ops
            ops = build_tri_ops(
                run_input.order, run_input.upts_type_tri,
                run_input.fpts_type_tri, run_input.vcjh_scheme_tri,
                run_input.c_tri)
        elif ctype == TET:
            from ..ops.operators import build_tet_ops
            ops = build_tet_ops(
                run_input.order, run_input.upts_type_tet,
                run_input.fpts_type_tet, run_input.vcjh_scheme_tet,
                run_input.c_tet)
        elif ctype == PRISM:
            from ..ops.operators import build_pri_ops
            ops = build_pri_ops(
                run_input.order, run_input.upts_type_pri_tri,
                run_input.upts_type_pri_1d, run_input.vcjh_scheme_pri_1d,
                run_input.eta_pri, run_input.vcjh_scheme_tri,
                run_input.c_tri)
        else:
            raise NotImplementedError(f"ctype {ctype} solver block")
        self.ops = ops
        self.block = build_element_block(
            mesh, self.conn, ops, delta_cyclic=delta_cyclic,
            over_int_order=(run_input.over_int_order if run_input.over_int
                            else None))

        self.rcfg = ResidualConfig(
            equation=run_input.equation, viscous=bool(run_input.viscous),
            riemann_solve_type=run_input.riemann_solve_type,
            gamma=run_input.gamma, prandtl=run_input.prandtl,
            prandtl_t=run_input.prandtl_t,
            mu_inf=0.0 if np.isnan(run_input.mu_inf) else run_input.mu_inf,
            rt_inf=1.0 if np.isnan(run_input.rt_inf) else run_input.rt_inf,
            c_sth=0.0 if np.isnan(run_input.c_sth) else run_input.c_sth,
            fix_vis=run_input.fix_vis, ldg_tau=run_input.ldg_tau,
            ldg_beta=run_input.ldg_beta, rans=bool(run_input.RANS),
            wave_speed=tuple(run_input.wave_speed),
            lambda_lf=run_input.lambda_lf, diff_coeff=run_input.diff_coeff,
            fused=fused, n_fields=self.n_fields, precision=precision,
            over_int=bool(run_input.over_int),
            les=bool(run_input.LES), sgs_model=run_input.SGS_model,
            C_s=run_input.C_s, filter_ratio=run_input.filter_ratio,
            filter_type=run_input.filter_type, kappa=run_input.Kappa,
            c_v1=run_input.c_v1, c_v2=run_input.c_v2, c_v3=run_input.c_v3,
            c_b1=run_input.c_b1, c_b2=run_input.c_b2, c_w2=run_input.c_w2,
            c_w3=run_input.c_w3, omega=run_input.omega)

        # wall distance for SA / wall-damped Smagorinsky / wall models
        # (ref:src/geometry.cpp:708-894)
        if (run_input.RANS or run_input.wall_model
                or (run_input.LES and run_input.SGS_model == 0)):
            from ..config.params import ADIABAT_WALL, ISOTHERM_WALL
            wall_slots = []
            for f, bcid in enumerate(self.block.bdy_bcid):
                flag = bc_flags.get(int(bcid), -1)
                if flag in (ISOTHERM_WALL, ADIABAT_WALL):
                    wall_slots.append(
                        self.block.bdy_slot[f][self.block.bdy_mask[f] > 0])
            wall_pts = (self.block.pos_fpts[np.concatenate(wall_slots)]
                        if wall_slots else np.empty((0, self.n_dims)))
            self.block.compute_wall_distance(wall_pts)

        bc_fns = None
        if self.block.bdy_slot.size:
            from .bc import make_bc_functions
            bc_fns = make_bc_functions(run_input, self.block, self.rcfg,
                                       dtype)

        self.residual_fn = make_residual_fn(self.block, self.rcfg, dtype,
                                            bc_fns)
        self._bc_fns = bc_fns
        self._gradient_fn = None
        self._dt_jit = None
        # field-major (E, F, U) residual: numerically identical (1e-11)
        # but measured SLOWER than the face path on TPU v5e (254x vs 295x
        # baseline on the TGV bench — its explicit face-row transposes cost
        # more than the layout copies it removes), so it is opt-in via
        # HIFILES_FM=1 for layout experiments
        self.residual_fm = None
        import os as _os
        if _os.environ.get("HIFILES_FM") and not run_input.shock_cap \
                and not run_input.wall_model:
            from .residual import make_residual_fm
            self.residual_fm = make_residual_fm(self.block, self.rcfg,
                                                dtype, bc_fns)

        # SoA (U, F, E) residual: elements-minor layout, numerically
        # identical (tests/test_residual_soa.py) and the default fast path
        # for the time loop on TPU — the (E, U, F) layouts pad F=5 to 128
        # lanes and cost ~half of every stage in relayout copies (see
        # residual_soa.py).  Covers the feature physics (LES/RANS/over-int/
        # shock capture/wall models) as of round 3.  Opt out with
        # HIFILES_NO_SOA=1.
        self.residual_soa = None
        if not _os.environ.get("HIFILES_NO_SOA"):
            from .residual_soa import make_residual_soa
            self.residual_soa = make_residual_soa(self.block, self.rcfg,
                                                  dtype, bc_fns)

        # turbulent inlet (white noise / SEM), updated once per step at
        # stage 0 (ref:src/solver.cpp:111-118)
        self.turb_inlet = None
        self._ti_state = None
        if run_input.LES and bc_fns is not None:
            from .turb_inlet import build_turb_inlet
            ti = build_turb_inlet(run_input, self.block, bc_flags, bc_fns,
                                  dtype)
            if ti is not None:
                self.turb_inlet = ti
                self._ti_state = ti.init_state

        # SVV model: replace the solution with its filtered version once per
        # step (ref:src/eles.cpp:2087-2089, stage-0 calc_sgs_terms)
        self._pre_step = None
        self._pre_step_soa = None
        if run_input.LES and run_input.SGS_model == 3:
            from ..ops.les_filter import build_les_filter
            svv = jnp.asarray(build_les_filter(ops, run_input.filter_type,
                                               run_input.filter_ratio),
                              dtype=dtype)
            self._pre_step = lambda u: jnp.einsum("ku,euf->ekf", svv, u)
            self._pre_step_soa = lambda u: jax.lax.dot_general(
                svv, u, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype)

        post_stage = None
        self._post_stage_soa = None
        self.sensor_fn = None
        if run_input.shock_cap:
            from ..ops.stabilization import (make_shock_capture_fn,
                                             make_shock_capture_soa)
            capture = make_shock_capture_fn(
                ops, run_input.s0, run_input.expf_fac, run_input.expf_order,
                run_input.expf_cutoff, run_input.shock_det_field,
                self.n_dims, dtype)
            post_stage = lambda u: capture(u)[0]
            self.sensor_fn = jax.jit(lambda u: capture(u)[1])
            self._post_stage_soa = make_shock_capture_soa(
                ops, run_input.s0, run_input.expf_fac, run_input.expf_order,
                run_input.expf_cutoff, run_input.shock_det_field,
                self.n_dims, dtype, precision)

        self._post_stage = post_stage
        self._step = make_step_fn(self.residual_fn, run_input.adv_type,
                                  post_stage=post_stage)
        self.n_stages = N_STAGES[run_input.adv_type]

        # BC ramping & channel/hill body forcing state
        self._has_ramp = any(getattr(b, "pressure_ramp", 0)
                             for b in run_input.bc_list) \
            if run_input.bc_list else False
        self._iter_k = jnp.asarray(1, jnp.int32)   # ref:src/input.cpp:377
        self._forcing = bool(run_input.forcing) and run_input.equation == 0
        self._mdot_old = jnp.asarray(run_input.body_force_mdot0
                                     if self._forcing else 0.0, dtype)
        if self._forcing:
            # inflow plane = cyclic faces with normal -x
            # (ref:src/eles.cpp:5313-5337, the reference's inlet hack)
            from ..config.params import CYCLIC as _CYC
            from ..mesh.core import NUM_F_PER_C
            fpt_off = np.concatenate([[0],
                                      np.cumsum(ops.n_fpts_per_face)])
            sl_list = []
            for c in range(mesh.n_cells):
                for k in range(NUM_F_PER_C[int(mesh.ctype[c])]):
                    bid = int(mesh.bc_id[c, k])
                    if bid < 0 or bc_flags.get(bid, -1) != _CYC:
                        continue
                    nfp = int(ops.n_fpts_per_face[k])
                    sl = c * ops.n_fpts + fpt_off[k] + np.arange(nfp)
                    if self.block.norm_fpts[sl[0], 0] < -0.99:
                        sl_list.append(sl)
            if not sl_list:
                raise ValueError("body forcing: no -x cyclic inflow plane")
            fs = np.concatenate(sl_list)
            self._force_slots = fs
            self._force_wdA = (ops.fpt_weights[fs % ops.n_fpts]
                               * self.block.tdA_fpts[fs])

        # initial condition at solution points (ref:src/solver.cpp:321-340)
        u0 = initial_condition(run_input, self.block.pos_upts, self.n_fields)
        if run_input.patch:
            from .ics import apply_patch
            u0 = apply_patch(run_input, self.block.pos_upts, u0)
        self.u = jnp.asarray(u0, dtype=dtype)
        self.reg = jnp.zeros_like(self.u)
        self.time = 0.0

        # running time averages (ref:src/eles.cpp:5630-5700
        # CalcTimeAverageQuantities): avg <- a*avg + b*current each step
        self._avg = bool(run_input.average_fields)
        self.u_avg = None
        if self._avg:
            for f_ in run_input.average_fields:
                if f_ not in ("rho_average", "u_average", "v_average",
                              "w_average", "e_average"):
                    raise ValueError(f"unknown average field '{f_}'")
            self.u_avg = jnp.zeros(
                (self.block.n_eles, ops.n_upts,
                 len(run_input.average_fields)), dtype)
        self._t_sim = jnp.asarray(0.0, dtype)

        self._simple = (self.turb_inlet is None and not self._has_ramp
                        and not self._forcing and not self._avg)
        self._run_chunk = jax.jit(self._make_run_chunk(), static_argnums=2,
                                  donate_argnums=0)
        from ..utils import log_residual_path
        log_residual_path("Solver", self.run_path)

    # ------------------------------------------------------------------
    def _make_run_chunk(self):
        """The fused time loop: one lax.scan whose carry holds the state,
        the RK register, the iteration counter (for BC ramping), the
        turbulent-inlet state, and the body-forcing mass-flux memory
        (ref:src/HiFiLES.cpp:194-317 driver loop)."""
        step = self._step
        pre = self._pre_step
        p = self.p
        dtype = self.dtype
        pre_soa = self._pre_step_soa
        if self._simple:
            if self.residual_soa is not None and (pre is None
                                                  or pre_soa is not None):
                self.run_path = "SoA (fast)"
                from .step import make_step_fn as _mk
                step_soa = _mk(self.residual_soa, p.adv_type,
                               post_stage=self._post_stage_soa)

                def run_chunk(state, dt, n_steps):
                    # transpose to elements-minor once per chunk; the whole
                    # scan runs on (U, F, E) state (see residual_soa.py).
                    # Local dt arrives (E, 1, 1) for the (E, U, F) layout;
                    # re-lay it out along the minor element axis.
                    dt_c = (jnp.reshape(dt, (1, 1, -1))
                            if getattr(dt, "ndim", 0) == 3 else dt)
                    us = jnp.transpose(state[0], (1, 2, 0))
                    rs = jnp.transpose(state[1], (1, 2, 0))

                    def body(carry, _):
                        u = carry[0]
                        if pre_soa is not None:
                            u = pre_soa(u)
                        return step_soa(u, carry[1], dt_c), None
                    import os as _os
                    unroll = int(_os.environ.get("HIFILES_UNROLL", "1"))
                    (us, rs), _ = jax.lax.scan(body, (us, rs), None,
                                               length=n_steps,
                                               unroll=unroll)
                    return (jnp.transpose(us, (2, 0, 1)),
                            jnp.transpose(rs, (2, 0, 1)))
                return run_chunk

            if self.residual_fm is not None and pre is None:
                self.run_path = "field-major (fast)"
                from .step import make_step_fn as _mk
                step_fm = _mk(self.residual_fm, p.adv_type)

                def run_chunk(state, dt, n_steps):
                    # transpose to field-major once per chunk; the whole
                    # scan runs on (E, F, U) state
                    ufm = jnp.transpose(state[0], (0, 2, 1))
                    rfm = jnp.transpose(state[1], (0, 2, 1))

                    def body(carry, _):
                        return step_fm(carry[0], carry[1], dt), None
                    (ufm, rfm), _ = jax.lax.scan(body, (ufm, rfm), None,
                                                 length=n_steps)
                    return (jnp.transpose(ufm, (0, 2, 1)),
                            jnp.transpose(rfm, (0, 2, 1)))
                return run_chunk

            self.run_path = "slot (fallback, up to 20x slower)"

            def run_chunk(state, dt, n_steps):
                def body(carry, _):
                    u, r = carry[0], carry[1]
                    if pre is not None:
                        u = pre(u)
                    u, r = step(u, r, dt)
                    return (u, r) + carry[2:], None
                state, _ = jax.lax.scan(body, state, None, length=n_steps)
                return state
            return run_chunk

        from .step import make_step_fn as _mk
        prec = jax.lax.Precision[self.rcfg.precision.upper()]
        nF = self.n_fields
        residual_fn = self.residual_fn
        post_stage = self._post_stage
        ti = self.turb_inlet
        has_ramp = self._has_ramp
        forcing = self._forcing
        opp_0 = jnp.asarray(self.ops.opp_0, dtype=dtype)
        bdy_slot = jnp.asarray(self.block.bdy_slot, dtype=jnp.int32)
        if forcing:
            fslots = jnp.asarray(self._force_slots, dtype=jnp.int32)
            fwdA = jnp.asarray(self._force_wdA, dtype=dtype)
            area = p.body_force_area
            mdot0 = p.body_force_mdot0
        d = self.n_dims
        avg = self._avg
        if avg:
            avg_fields = list(p.average_fields)
            spinup = p.spinup_time

        # "Non-simple" runs (SEM inlets, BC ramping, body forcing, time
        # averages) stay on the SoA fast path too (round 4): the inlet
        # face extraction is one opp_0 GEMM, forcing is a reduction over
        # static gathers, averaging is elementwise on (U, K, E) planes —
        # only the fluc/source/average bookkeeping differs from _simple
        # (ref:src/eles.cpp:5281-5484, :5630-5700, bdy_inters.cpp:1478).
        if self.residual_soa is not None and (self._pre_step is None
                                              or pre_soa is not None):
            self.run_path = "SoA featured (fast)"
            residual_soa = self.residual_soa
            post_soa = self._post_stage_soa
            Pf = self.ops.n_fpts
            if ti is not None:
                bs = self.block.bdy_slot
                nfp_b = bs.shape[1]
                ti_rows = jnp.asarray(
                    ((bs % Pf)[:, :, None] * nF
                     + np.arange(nF)[None, None, :]).reshape(
                        bs.shape[0], nfp_b * nF), jnp.int32)
                ti_eles = jnp.asarray(bs[:, 0] // Pf, jnp.int32)
            if forcing:
                fs = self._force_slots
                frows = [jnp.asarray((fs % Pf) * nF + k, jnp.int32)
                         for k in (0, 1)]
                fcols = jnp.asarray(fs // Pf, jnp.int32)

            def run_chunk(state, dt, n_steps):
                u0, r0, k0, ti0, mdot0_, tsim0, uavg0 = state
                us = jnp.transpose(u0, (1, 2, 0))
                rs = jnp.transpose(r0, (1, 2, 0))
                ua0 = (jnp.transpose(uavg0, (1, 2, 0)) if avg else uavg0)
                dt_c = (jnp.reshape(dt, (1, 1, -1))
                        if getattr(dt, "ndim", 0) == 3 else dt)

                def body(carry, _):
                    u, r, k, ti_state, mdot_old, t_sim, ua = carry
                    if pre_soa is not None:
                        u = pre_soa(u)
                    ramp = k.astype(dtype) if has_ramp else None
                    fluc = None
                    dt_s = (jnp.min(dt_c) if hasattr(dt_c, "ndim")
                            and dt_c.ndim else dt_c)
                    if ti is not None or forcing:
                        d2 = jax.lax.dot_general(
                            opp_0, u, (((1,), (0,)), ((), ())),
                            precision=prec,
                            preferred_element_type=dtype).reshape(
                                Pf * nF, -1)
                    if ti is not None:
                        u_bl = d2[ti_rows, ti_eles[:, None]].reshape(
                            ti_rows.shape[0], -1, nF)
                        ti_state, fluc = ti.update(ti_state, u_bl, dt_s)
                    source = None
                    if forcing:
                        # channel/hill bulk-momentum forcing
                        # (ref:src/eles.cpp:5281-5484 evaluate_body_force)
                        rho_pl = d2[frows[0], fcols]
                        mom_pl = d2[frows[1], fcols]
                        mflux = jnp.sum(fwdA * mom_pl)
                        rho_int = jnp.sum(fwdA * rho_pl)
                        ubulk = jnp.where(rho_int == 0, 0.0,
                                          mflux / rho_int)
                        if p.body_force_type == 1:
                            bf1 = (mdot0 - mflux) / (area * dt_s)
                        else:
                            bf1 = (mdot0 - 2.0 * mflux + mdot_old) \
                                / (area * dt_s)
                        bf = jnp.zeros((nF,), dtype).at[1].set(bf1)
                        bf = bf.at[d + 1].set(bf1 * ubulk)
                        bf2 = bf[:, None]          # broadcasts (U, F, E)
                        source = lambda uu: bf2
                        mdot_old = mflux
                    inner = _mk(lambda uu: residual_soa(uu, fluc, ramp),
                                p.adv_type, source_fn=source,
                                post_stage=post_soa)
                    u, r = inner(u, r, dt_c)
                    t_sim = t_sim + dt_s
                    if avg:
                        # running average (ref:src/eles.cpp:5676-5698)
                        rho = u[:, 0]
                        cols = []
                        for f_ in avg_fields:
                            if f_ == "rho_average":
                                cols.append(rho)
                            elif f_ == "u_average":
                                cols.append(u[:, 1] / rho)
                            elif f_ == "v_average":
                                cols.append(u[:, 2] / rho)
                            elif f_ == "w_average":
                                cols.append(u[:, 3] / rho)
                            else:  # e_average
                                cols.append(u[:, d + 1] / rho)
                        cur = jnp.stack(cols, axis=1)       # (U, K, E)
                        t_rel = t_sim - spinup
                        a = (t_rel - dt_s) / t_rel
                        b = dt_s / t_rel
                        ua = jnp.where(t_rel <= dt_s, cur,
                                       a * ua + b * cur)
                    return (u, r, k + 1, ti_state, mdot_old, t_sim,
                            ua), None

                carry = (us, rs, k0, ti0, mdot0_, tsim0, ua0)
                carry, _ = jax.lax.scan(body, carry, None, length=n_steps)
                us, rs, k0, ti0, mdot0_, tsim0, ua0 = carry
                return (jnp.transpose(us, (2, 0, 1)),
                        jnp.transpose(rs, (2, 0, 1)), k0, ti0, mdot0_,
                        tsim0,
                        jnp.transpose(ua0, (2, 0, 1)) if avg else ua0)
            return run_chunk

        self.run_path = "slot featured (fallback, up to 20x slower)"

        def run_chunk(state, dt, n_steps):
            def body(carry, _):
                u, r, k, ti_state, mdot_old, t_sim, u_avg = carry
                if pre is not None:
                    u = pre(u)
                ramp = k.astype(dtype) if has_ramp else None
                fluc = None
                # scalar step for eddy advection / forcing under local dt
                # (the reference advances eddies with the global run_input.dt
                # regardless, ref:src/funcs.cpp:1689)
                dt_s = jnp.min(dt) if hasattr(dt, "ndim") and dt.ndim else dt
                if ti is not None or forcing:
                    disu_f = jnp.einsum(
                        "pu,euf->epf", opp_0, u,
                        preferred_element_type=dtype,
                        precision=prec).reshape(-1, nF)
                if ti is not None:
                    ti_state, fluc = ti.update(ti_state, disu_f[bdy_slot],
                                               dt_s)
                source = None
                if forcing:
                    # channel/hill bulk-momentum forcing
                    # (ref:src/eles.cpp:5281-5484 evaluate_body_force)
                    uf = disu_f[fslots]                   # (Ns, F)
                    mflux = jnp.sum(fwdA * uf[:, 1])
                    rho_int = jnp.sum(fwdA * uf[:, 0])
                    ubulk = jnp.where(rho_int == 0, 0.0, mflux / rho_int)
                    if p.body_force_type == 1:
                        # SD3D relaxation form (stable deadbeat,
                        # ref:src/eles.cpp:5425 commented variant)
                        bf1 = (mdot0 - mflux) / (area * dt_s)
                    else:
                        # HIOCFD C3.4 two-step form (ref::5427)
                        bf1 = (mdot0 - 2.0 * mflux + mdot_old) / (area * dt_s)
                    bf = jnp.zeros((nF,), dtype).at[1].set(bf1)
                    bf = bf.at[d + 1].set(bf1 * ubulk)
                    source = lambda uu: bf
                    mdot_old = mflux
                inner = _mk(lambda uu: residual_fn(uu, fluc, ramp),
                            p.adv_type, source_fn=source,
                            post_stage=post_stage)
                u, r = inner(u, r, dt)
                t_sim = t_sim + dt_s
                if avg:
                    # running average after the step
                    # (ref:src/eles.cpp:5676-5698)
                    rho = u[..., 0]
                    cols = []
                    for f_ in avg_fields:
                        if f_ == "rho_average":
                            cols.append(rho)
                        elif f_ == "u_average":
                            cols.append(u[..., 1] / rho)
                        elif f_ == "v_average":
                            cols.append(u[..., 2] / rho)
                        elif f_ == "w_average":
                            cols.append(u[..., 3] / rho)
                        else:  # e_average
                            cols.append(u[..., d + 1] / rho)
                    cur = jnp.stack(cols, axis=-1)
                    t_rel = t_sim - spinup
                    a = (t_rel - dt_s) / t_rel
                    b = dt_s / t_rel
                    u_avg = jnp.where(t_rel <= dt_s, cur,
                                      a * u_avg + b * cur)
                return (u, r, k + 1, ti_state, mdot_old, t_sim, u_avg), None
            state, _ = jax.lax.scan(body, state, None, length=n_steps)
            return state

        return run_chunk

    # ------------------------------------------------------------------
    @property
    def gradient_fn(self):
        """Corrected physical gradient at upts (the reference's
        grad_disu_upts after CalcResidual); built lazily — only force and
        diagnostic paths need it."""
        if self._gradient_fn is None:
            from .residual import make_gradient_fn
            self._gradient_fn = make_gradient_fn(self.block, self.rcfg,
                                                 self.dtype, self._bc_fns)
        return self._gradient_fn

    # ------------------------------------------------------------------
    def compute_dt(self):
        """CFL time step (ref:src/solver.cpp:484-549,
        ref:src/eles.cpp:1267-1356): dt_type 0 fixed, 1 global min,
        2 per-element local (returns an (E,) device array).

        Runs jitted ON DEVICE (the sharded path's dt_body ported back,
        parallel/sharding.py) so unsteady dt_type 1/2 runs never pull the
        state to the host; only the scalar min crosses for bookkeeping."""
        p = self.p
        if p.dt_type == 0:
            return p.dt
        # cache keyed on the deck knobs baked into the jitted fn, so a
        # later p.CFL / p.dt_type mutation rebuilds instead of being
        # silently ignored
        dt_key = (p.dt_type, float(p.CFL))
        if getattr(self, "_dt_key", None) != dt_key:
            self._dt_jit = None
            self._dt_key = dt_key
        if self._dt_jit is None:
            d, order = self.n_dims, p.order
            h_ref = jnp.asarray(self.block.h_ref, self.dtype)
            viscous = bool(p.viscous) and p.equation == 0
            gamma, CFL = p.gamma, p.CFL
            local = p.dt_type == 2

            def dt_fn(u):
                lam = max_wavespeed(u, gamma, d).max(axis=1)
                dt_ele = CFL * h_ref / lam / (2 * order + 1)
                if viscous:
                    from ..models.viscous import sutherland_mu
                    rho = u[..., 0]
                    ke = 0.5 * jnp.sum(u[..., 1:1 + d] ** 2, axis=-1) / rho
                    inte = (u[..., d + 1] - ke) / rho
                    mu = sutherland_mu(inte, gamma, p.mu_inf, p.rt_inf,
                                       p.c_sth, p.fix_vis)
                    lam_v = (max(4.0 / 3.0, gamma / p.prandtl)
                             * mu / rho).max(axis=1)
                    dt_ele = jnp.minimum(
                        dt_ele,
                        CFL * 0.25 * h_ref ** 2 / lam_v / (2 * order + 1))
                return dt_ele if local else dt_ele.min()

            self._dt_jit = jax.jit(dt_fn)
        return self._dt_jit(self.u)

    def run(self, n_steps: int, dt=None):
        if dt is None:
            dt = self.compute_dt()
        if getattr(dt, "ndim", 0) == 1:
            # local dt (numpy or device array): broadcasts (E,1,1) against
            # the (E,U,F) state in the RK update (ref:src/eles.cpp:1095-1105
            # dt_local); eddy advection and forcing use the global min step
            dt_min = float(dt.min())
            dt_j = jnp.asarray(dt, dtype=self.dtype)[:, None, None]
        else:
            dt_min = float(dt)
            dt_j = jnp.asarray(dt, self.dtype)
        if self._simple:
            state = self._run_chunk((self.u, self.reg), dt_j, n_steps)
            self.u, self.reg = state
        else:
            u_avg = self.u_avg if self.u_avg is not None \
                else jnp.zeros((), self.dtype)
            state = self._run_chunk(
                (self.u, self.reg, self._iter_k, self._ti_state,
                 self._mdot_old, self._t_sim, u_avg), dt_j, n_steps)
            (self.u, self.reg, self._iter_k, self._ti_state,
             self._mdot_old, self._t_sim, u_avg) = state
            if self._avg:
                self.u_avg = u_avg
        self.time += dt_min * n_steps
        return self.u

    # ------------------------------------------------------------------
    def compute_error(self, norm_type: int | None = None,
                      u_grad=None) -> np.ndarray:
        """Volume-cubature error vs the analytic test case
        (ref:src/eles.cpp:5076-5136, ref:src/output.cpp:2052-2164).

        Returns (2, n_fields): [solution error, gradient error]; final norms
        are sqrt() for L2 outside (the reference prints sqrt of the global
        reduction)."""
        p = self.p
        norm_type = norm_type if norm_type is not None else p.error_norm_type
        ops = self.ops
        u = np.asarray(self.u, dtype=np.float64)
        disu_cub = np.einsum("cu,euf->ecf", ops.opp_vol_cubpts, u)
        sol_a, grad_a = analytic_solution(p, self.block.pos_vol_cubpts,
                                          self.time, self.n_fields)
        err = disu_cub - sol_a
        w = ops.w_vol_cubpts[None, :] * self.block.detjac_vol_cubpts
        out = np.zeros((2, self.n_fields))
        if norm_type == 1:
            out[0] = np.einsum("ec,ecf->f", w, np.abs(err))
        else:
            out[0] = np.einsum("ec,ecf->f", w, err * err)
        # gradient error row (ref:src/eles.cpp:5109-5123,5185-5280):
        # computed for viscous test cases, and only for the fields whose
        # analytic gradient exists (the reference leaves error_grad_sol
        # zero elsewhere): tc 2/3 -> field 0 only, tc 5 (Couette) -> all
        # note the reference's gradient row is computed from grad_disu_upts
        # LEFT OVER from the final RK stage's CalcResidual — i.e. the
        # gradient of the last stage's input state, not of the final u
        # (ref:src/HiFiLES.cpp:201-233 + eles.cpp:5109-5117); pass u_grad
        # to reproduce that exactly (used by the parity test)
        if p.viscous and p.test_case in (2, 3, 5):
            ug = self.u if u_grad is None else u_grad
            grad_u = np.asarray(self.gradient_fn(ug), dtype=np.float64)
            grad_cub = np.einsum("cu,eufd->ecfd", ops.opp_vol_cubpts, grad_u)
            gerr = grad_cub - grad_a
            if p.test_case in (2, 3):
                gerr = gerr[..., :1, :]
            if norm_type == 1:
                row = np.einsum("ec,ecfd->f", w, np.abs(gerr))
            else:
                row = np.einsum("ec,ecfd->f", w, gerr * gerr)
            out[1, :row.shape[0]] = row
        return out

    def inflow_massflux(self):
        """(mass_flux, ubulk, next body force) through the -x cyclic
        inflow plane, host-side — the rows of the reference's
        massflux.dat (ref:src/eles.cpp:5430-5453).  The body-force value
        is the one the NEXT step will apply from this state."""
        if not self._forcing:
            return None
        u = np.asarray(self.u, dtype=np.float64)
        d2 = np.einsum("pu,euf->epf", self.ops.opp_0, u).reshape(
            -1, self.n_fields)
        uf = d2[self._force_slots]
        w = np.asarray(self._force_wdA, dtype=np.float64)
        mflux = float((w * uf[:, 1]).sum())
        rho_int = float((w * uf[:, 0]).sum())
        ubulk = 0.0 if rho_int == 0 else mflux / rho_int
        p = self.p
        dt_s = p.dt
        if p.body_force_type == 1:
            bf1 = (p.body_force_mdot0 - mflux) / (p.body_force_area * dt_s)
        else:
            bf1 = (p.body_force_mdot0 - 2.0 * mflux
                   + float(self._mdot_old)) / (p.body_force_area * dt_s)
        return mflux, ubulk, bf1

    def _monitor_residual(self):
        """Device residual of the current state for the monitor row.
        Uses the SoA fast path when engaged — identical physics (parity
        asserted in tests/test_residual_soa.py); the slot-path parity
        residual costs ~35 s of tracing (and minutes of XLA compile when
        cold) per bench config just to produce a 5-number row."""
        if self.residual_soa is None:
            return self.residual_fn(self.u)
        if getattr(self, "_res_soa_jit", None) is None:
            rsoa = self.residual_soa

            def f(u):
                r = rsoa(jnp.transpose(u, (1, 2, 0)))
                return jnp.transpose(r, (2, 0, 1))
            self._res_soa_jit = jax.jit(f)
        return self._res_soa_jit(self.u)

    def residual_norm(self, norm_type: int = 2,
                      r: np.ndarray | None = None) -> np.ndarray:
        """Residual norm with the reference's normalization
        (ref:src/output.cpp:2166-2247): L1 = sum|r|/n_pts,
        L2 = sqrt(sum r^2)/n_pts, inf = max|r|.  Accumulates in f64 on
        the host like the reference's double accumulators, so the
        monitor row is exact for the device residual it is given."""
        if r is None:
            r = np.asarray(self._monitor_residual())
        r = np.asarray(r, dtype=np.float64)
        n_pts = r.shape[0] * r.shape[1]
        if norm_type == 1:
            return np.abs(r).sum(axis=(0, 1)) / n_pts
        if norm_type == 2:
            return np.sqrt((r * r).sum(axis=(0, 1))) / n_pts
        return np.abs(r).max(axis=(0, 1))
