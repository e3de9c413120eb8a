"""Batched ocean step built on the fused one-pass kernel.

Semantically equivalent to vmapping :func:`~mckpp_tpu.ops.ocnstep.ocnstep`
over columns (reference: mckpp_physics_ocnstep_mod.F90:43-357), but the
iteration control runs at the batch level with explicit per-column masks —
exactly the masked-update semantics JAX's while_loop batching rule produces —
and each {under-relax -> vertical mixing -> implicit solve} pass is ONE fused
kernel call (see ops/fused_pass.py) instead of ~50 XLA fusions.

Loop structure (mirroring the reference):

* extrapolate from the two-level history (:91-112);
* 3 compulsory smoothed passes (:122-135);
* hmix convergence while_loop, per-column masked (:140-192);
* instability-trap outer while_loop, per-column masked (:200-236);
* one extra *full* pass re-running each column's final pass from its saved
  inputs to materialize the diagnostic fields (difm/dift/difs, ghat, rho,
  cp, Rig, corrections, ...) — bitwise identical state to the last fast
  pass (the under-relaxation is idempotent at lambda=0.5), ~1/7 extra cost;
* diagnostic fluxes, damping, history ping-pong (:242-353).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as c
from ..config import KppConfig
from ..state import State, ColumnParams, Forcing
from . import fused_pass as fp


def supports_fused(cfg: KppConfig) -> bool:
    """The fused kernel covers every feature combination except the
    resident-table wscale mode (advection/rhsmod is in-kernel since r4:
    lane-masked basis profiles in the scalar-RHS stage)."""
    return (cfg.physics.wscale_mode in ("nodal", "analytic")
            and cfg.physics.solver == "pcr")


def pass_flags(cfg: KppConfig) -> fp.PassFlags:
    ph, b, f, cst = cfg.physics, cfg.boundary, cfg.forcing, cfg.constants
    return fp.PassFlags(
        lri=ph.lri, ldd=ph.ldd, lkpp=ph.lkpp,
        l_relax_sst=b.l_relax_sst, l_relax_calconly=b.l_relax_calconly,
        l_fcorr=f.l_fcorr, l_fcorr_withz=f.l_fcorr_withz,
        l_sfcorr_withz=f.l_sfcorr_withz, l_relax_sal=b.l_relax_sal,
        l_relax_ocnt=b.l_relax_ocnt, l_advect=b.l_advect,
        wscale=ph.wscale_mode,
        grav=cst.grav, vonk=cst.vonk, sice=cst.sice)


def _pad(a, wz):
    return jnp.pad(a, ((0, 0), (0, wz - a.shape[1])))


def make_ocnstep_fused(grid, cfg: KppConfig, dtype, *, impl="xla",
                       block=128):
    """Build step_fn(st, prm, frc, first_step) -> (new_state, comp_flag).

    ``impl`` ending in "_step" selects the WHOLE-STEP kernel
    (fused_pass.make_fused_step): the 3 compulsory passes, the
    hmix-convergence while_loop and the instability trap all run inside
    one kernel scope — state never round-trips HBM between passes, and
    each column block stops iterating when its own columns converge
    instead of paying for the batch's slowest column.  Results are
    bitwise-identical to the batch-level loops (same masked updates)."""
    whole_step = impl.endswith("_step")
    base_impl = {"xla_step": "xla", "pallas_step": "pallas",
                 "interpret_step": "interpret"}.get(impl, impl)
    ph = cfg.physics
    nz = grid.nz
    nzp1 = nz + 1
    wz = nz + 2
    dto = cfg.time.dto
    flags = pass_flags(cfg)
    lam = c.LAMBDA_SMOOTH
    # kernel layout: columns-on-lanes (zaxis=0) keeps every vector register
    # fully occupied (z goes to sublanes); z-on-lanes (zaxis=1) wastes
    # 1 - (nz+2)/128 of the VPU at production nz.  State stays (ncol, ...)
    # outside the kernel; transposes happen once per step, not per pass.
    zaxis = 0 if ph.pass_layout == "col_lanes" else 1

    # grid rows, batch-layout (1, WZ) for the post-loop diagnostics;
    # hm padding lane set to 1 to keep divisions finite
    zm_np = np.pad(np.asarray(grid.zm), (0, 1))
    hm_np = np.pad(np.asarray(grid.hm), (0, 1), constant_values=1.0)
    dm_np = np.pad(np.asarray(grid.dm), (0, 1))
    tdn_np = np.pad(np.asarray(grid.tri_dn), (0, 1))
    tup_np = np.pad(np.asarray(grid.tri_up), (0, 1))
    zm_row = jnp.asarray(zm_np, dtype)[None, :]
    hm_row = jnp.asarray(hm_np, dtype)[None, :]
    # kernel-layout grid rows
    if zaxis == 1:
        orient = lambda a: jnp.asarray(a, dtype)[None, :]
    else:
        orient = lambda a: jnp.asarray(a, dtype)[:, None]
    zm_r, hm_r = orient(zm_np), orient(hm_np)
    dm_r, tdn_r, tup_r = orient(dm_np), orient(tdn_np), orient(tup_np)
    aref_np = fp.build_ref_matrix(np.asarray(grid.zm), wz)
    aref = jnp.asarray(aref_np if zaxis == 1 else aref_np.T, dtype)
    hm_lvl = jnp.asarray(grid.hm, dtype)            # (nzp1,)
    rfac_t = jnp.asarray(c.JERLOV_RFAC, dtype)
    a1_t = jnp.asarray(c.JERLOV_A1, dtype)
    a2_t = jnp.asarray(c.JERLOV_A2, dtype)

    def step_fn(st: State, prm: ColumnParams, frc: Forcing, first_step,
                with_diags: bool = True):
        """``with_diags=False`` skips the final materialization pass: the
        prognostic trajectory (u, x, history, hmix, surface rho/cp for the
        next ntflux) is bitwise identical, but the wide diagnostic fields
        (difm/rho profiles/wu/wx/corrections) keep their previous values.
        The reference computes those inline from its per-column cache for
        free (mckpp_physics_ocnstep_mod.F90:242-256); on TPU the batch
        re-materialization costs ~a full pass, so callers skip it on steps
        where no output stream samples a wide field."""
        ncol = st.u.shape[0]
        fast = fp.make_fused_pass(grid, ncol, dtype, flags, dto,
                                  full=False, impl=base_impl, block=block,
                                  zaxis=zaxis) if not whole_step else None
        fullp = fp.make_fused_pass(grid, ncol, dtype, flags, dto,
                                   full=True, impl=base_impl, block=block,
                                   zaxis=zaxis) if with_diags else None
        fstep = fp.make_fused_step(
            grid, ncol, dtype, flags, dto, itermax=ph.itermax,
            hmixtolfrac=ph.hmixtolfrac, extra_iters=ph.extra_iters,
            impl=base_impl, block=block, zaxis=zaxis) if whole_step \
            else None
        active = prm.run_physics
        # batch (ncol, wz) <-> kernel layout
        tok = (lambda a: a) if zaxis == 1 else (lambda a: a.T)
        tob = tok
        co = ((lambda c_, k: c_[:, k]) if zaxis == 1
              else (lambda c_, k: c_[k]))

        def mcol(mask, a, b):
            """Masked merge with a (ncol,) mask, layout-aware."""
            if a.ndim == 1:
                return jnp.where(mask, a, b)
            m = mask[:, None] if zaxis == 1 else mask[None, :]
            return jnp.where(m, a, b)

        # ---- history-phase repair + extrapolation (:91-112) --------------
        old = jnp.where((st.old < 0) | (st.old > 1), st.new, st.old)
        new = jnp.where((st.new < 0) | (st.new > 1), old, st.new)
        sel_new = (new == 1)[:, None, None]
        sel_old = (old == 1)[:, None, None]
        us_new = jnp.where(sel_new, st.us[..., 1], st.us[..., 0])
        us_old = jnp.where(sel_old, st.us[..., 1], st.us[..., 0])
        xs_new = jnp.where(sel_new, st.xs[..., 1], st.xs[..., 0])
        xs_old = jnp.where(sel_old, st.xs[..., 1], st.xs[..., 0])
        u_ex3 = 2.0 * us_new - us_old                  # (ncol, nzp1, 2)
        x_ex3 = 2.0 * xs_new - xs_old

        u_e = tok(_pad(u_ex3[:, :, 0], wz))
        v_e = tok(_pad(u_ex3[:, :, 1], wz))
        t_e = tok(_pad(x_ex3[:, :, 0], wz))
        s_e = tok(_pad(x_ex3[:, :, 1], wz))
        uo = tok(_pad(st.u[:, :, 0], wz))
        vo = tok(_pad(st.u[:, :, 1], wz))
        to = tok(_pad(st.x[:, :, 0], wz))
        so = tok(_pad(st.x[:, :, 1], wz))
        swdk_c = tok(_pad(st.swdk_opt, wz))
        swfrac_c = tok(_pad(st.swfrac, wz))

        one = jnp.ones((ncol,), dtype)
        zero = jnp.zeros((ncol,), dtype)
        first_v = jnp.where(first_step, one, zero)
        rfac = jnp.take(rfac_t, prm.jerlov)
        a1j = jnp.take(a1_t, prm.jerlov)
        a2j = jnp.take(a2_t, prm.jerlov)

        if flags.l_advect:
            # group per-column advection magnitudes by rhsmod mode (the
            # salinity scalar's entries only, ocnint_mod.F90:179-184):
            # coef_m = sum over active entries im with modeadv(im,2)==m
            nm_s = prm.nmodeadv[:, 1]
            adv_coef = []
            for mode in range(1, 8):
                cm = jnp.zeros((ncol,), dtype)
                for im in range(prm.modeadv.shape[1]):
                    act = (im < nm_s) & (prm.modeadv[:, im, 1] == mode)
                    cm = cm + jnp.where(
                        act, prm.advection[:, im, 1].astype(dtype), 0.0)
                adv_coef.append(cm)
        else:
            adv_coef = [zero] * 7

        def colscal_of(f_local):
            cols = [frc.sflux[:, k] for k in range(6)]
            cols += [st.ssurf, prm.sref, f_local, prm.ocdepth,
                     rfac, a1j, a2j, first_v,
                     prm.relax_sst, frc.sst0, frc.fcorr_twod,
                     prm.relax_ocnt, prm.relax_sal, st.fcorr]
            cols += adv_coef
            # step-kernel rows (27-29): active mask + previous surface
            # rho/cp (unused by the pass-only path)
            cols += [prm.run_physics, st.rho[:, 0], st.cp[:, 0]]
            cols += [zero] * (fp.NSC - len(cols))
            return jnp.stack([jnp.asarray(cc, dtype) for cc in cols],
                             axis=zaxis)

        dummy = jnp.zeros((1, wz) if zaxis == 1 else (wz, 1), dtype)
        ocnt_p = tok(_pad(frc.ocnt_clim, wz)) if flags.l_relax_ocnt else dummy
        sal_p = tok(_pad(frc.sal_clim, wz)) if flags.l_relax_sal else dummy
        fcz_p = (tok(_pad(frc.fcorr_withz, wz))
                 if flags.l_fcorr_withz else dummy)
        sfcz_p = (tok(_pad(frc.sfcorr_withz, wz))
                  if flags.l_sfcorr_withz else dummy)

        def run_pass(fn, u, v, t, s, ux, vx, tx, sx, csc):
            return fn(u, v, t, s, ux, vx, tx, sx, uo, vo, to, so,
                      swdk_c, swfrac_c, ocnt_p, sal_p, fcz_p, sfcz_p,
                      csc, zm_r, hm_r, dm_r, tdn_r, tup_r, aref)

        def integrate(f_local):
            """One full semi-implicit integration attempt (:103-192)."""
            csc = colscal_of(f_local)
            u, v, t, s = u_e, v_e, t_e, s_e
            ux, vx, tx, sx = u_e, v_e, t_e, s_e
            for _ in range(3):            # compulsory passes (:122-135)
                u, v, t, s, ux, vx, tx, sx, colout = run_pass(
                    fast, u, v, t, s, ux, vx, tx, sx, csc)
            hmixn = co(colout, 0)
            kmixn = co(colout, 1).astype(jnp.int32)
            rho0n = co(colout, 2)
            cp0n = co(colout, 3)
            if not ph.lkpp:
                return u, v, t, s, ux, vx, tx, sx, hmixn, kmixn, rho0n, cp0n

            def cond(carry):
                return jnp.any(carry[-1])

            def body(carry):
                (u, v, t, s, ux, vx, tx, sx,
                 hmixe, kmixe, hmixn, kmixn, rho0, cp0,
                 it, iconv, cont) = carry
                (u_n, v_n, t_n, s_n, ux_n, vx_n, tx_n, sx_n,
                 colout) = run_pass(fast, u, v, t, s, ux, vx, tx, sx, csc)
                hmix_p = co(colout, 0)
                kmix_p = co(colout, 1).astype(jnp.int32)
                rho0_p = co(colout, 2)
                cp0_p = co(colout, 3)
                it_n = it + 1
                tol = ph.hmixtolfrac * jnp.where(
                    kmix_p == nzp1, hm_lvl[nz - 1],
                    jnp.take(hm_lvl, jnp.clip(kmix_p - 1, 0, nz)))
                iconv_n = jnp.where(jnp.abs(hmix_p - hmixe) > tol,
                                    0, iconv + 1)
                cont_n = ((iconv_n < 3)
                          & ((it_n < ph.itermax) | (hmix_p > hmixe))
                          & (it_n < ph.itermax + ph.extra_iters) & active)
                hmixe_n = jnp.where(cont_n, hmix_p, hmixe)
                kmixe_n = jnp.where(cont_n, kmix_p, kmixe)

                m = lambda a, b: mcol(cont, a, b)

                return (m(u_n, u), m(v_n, v), m(t_n, t), m(s_n, s),
                        m(ux_n, ux), m(vx_n, vx), m(tx_n, tx), m(sx_n, sx),
                        m(hmixe_n, hmixe), m(kmixe_n, kmixe),
                        m(hmix_p, hmixn), m(kmix_p, kmixn),
                        m(rho0_p, rho0), m(cp0_p, cp0),
                        m(it_n, it), m(iconv_n, iconv), cont & cont_n)

            it0 = jnp.full((ncol,), 3, jnp.int32)
            ic0 = jnp.zeros((ncol,), jnp.int32)
            carry = (u, v, t, s, ux, vx, tx, sx, hmixn, kmixn,
                     hmixn, kmixn, rho0n, cp0n, it0, ic0, active)
            carry = jax.lax.while_loop(cond, body, carry)
            (u, v, t, s, ux, vx, tx, sx) = carry[:8]
            hmixn, kmixn = carry[10], carry[11]
            rho0n, cp0n = carry[12], carry[13]
            return u, v, t, s, ux, vx, tx, sx, hmixn, kmixn, rho0n, cp0n

        # ---- instability trap (:89, :194-236) -----------------------------
        li_k = jax.lax.broadcasted_iota(
            jnp.int32, (1, wz) if zaxis == 1 else (wz, 1), zaxis)
        w_rms = jnp.where(li_k <= nz, hm_r / grid.dm[nz].astype(dtype), 0.0)

        def instability(u, v, t, s):
            lvl = li_k < nz                     # levels 1..nz
            dxv = jnp.abs(t - fp._shl(t, 1, axis=zaxis))
            bad = lvl & ((jnp.abs(u) >= 10.0) | (jnp.abs(v) >= 10.0)
                         | (dxv >= 10.0))
            nbad = bad.sum(axis=zaxis)
            blown = bad.any(axis=zaxis)

            def rmsd(q, qo):
                return jnp.sqrt((((q - qo) ** 2) * w_rms).sum(axis=zaxis))

            thr = jnp.asarray(c.RMSD_THRESHOLD, dtype)
            exceed = jnp.stack([rmsd(u, uo) >= thr[0], rmsd(v, vo) >= thr[1],
                                rmsd(t, to) >= thr[2], rmsd(s, so) >= thr[3]],
                               axis=1)
            nexceed = jnp.where(blown, 0, exceed.sum(axis=1))
            comp = blown | exceed.any(axis=1)
            fmul = 1.01 ** (nbad + nexceed).astype(dtype)
            return comp, fmul

        def outer_cond(carry):
            comp, reset = carry[8], carry[9]
            return jnp.any(comp & (reset <= float(c.COMP_ITER_MAX)) & active)

        def outer_body(carry):
            f_local, reset = carry[10], carry[9]
            pred = carry[8] & (reset <= float(c.COMP_ITER_MAX)) & active
            res = integrate(f_local)
            u, v, t, s, ux, vx, tx, sx, hmixn, kmixn, rho0, cp0 = res
            comp_n, fmul = instability(u, v, t, s)
            f_n = f_local * jnp.where(comp_n, fmul, 1.0)
            reset_n = reset + 1.0

            m = lambda a, b: mcol(pred, a, b)
            o = carry
            # carry slot 13 records the f actually used by the surviving
            # attempt: the reference multiplies f AFTER the integration
            # (mckpp_physics_ocnstep_mod.F90:205,224), so the state it keeps
            # was computed with the PRE-multiplication value — the final
            # materialization pass below must use that one, not f_n.
            return (m(u, o[0]), m(v, o[1]), m(t, o[2]), m(s, o[3]),
                    m(ux, o[4]), m(vx, o[5]), m(tx, o[6]), m(sx, o[7]),
                    m(comp_n, o[8]), m(reset_n, o[9]), m(f_n, o[10]),
                    m(hmixn, o[11]), m(kmixn, o[12]), m(f_local, o[13]),
                    m(rho0, o[14]), m(cp0, o[15]))

        if whole_step:
            # one kernel call runs the compulsory passes + both masked
            # while loops per column block (fused_pass._step_body)
            csc0 = colscal_of(prm.f)
            outs = fstep(u_e, v_e, t_e, s_e, uo, vo, to, so,
                         swdk_c, swfrac_c, ocnt_p, sal_p, fcz_p, sfcz_p,
                         csc0, zm_r, hm_r, dm_r, tdn_r, tup_r, aref)
            u_fin_k, v_fin_k, t_fin_k, s_fin_k = outs[:4]
            ux_f, vx_f, tx_f, sx_f = outs[4:8]
            colstep = outs[8]
            hmixn = co(colstep, 0)
            kmixn = co(colstep, 1).astype(jnp.int32)
            rho0_fin = co(colstep, 2)
            cp0_fin = co(colstep, 3)
            comp_flag = co(colstep, 4) > 0.5
            reset_flag = co(colstep, 5)
            f_used = co(colstep, 6)
        else:
            carry0 = (u_e, v_e, t_e, s_e, u_e, v_e, t_e, s_e,
                      jnp.ones((ncol,), bool), jnp.zeros((ncol,), dtype),
                      prm.f, jnp.zeros((ncol,), dtype),
                      jnp.full((ncol,), nz, jnp.int32), prm.f,
                      jnp.asarray(st.rho[:, 0], dtype),
                      jnp.asarray(st.cp[:, 0], dtype))
            fin = jax.lax.while_loop(outer_cond, outer_body, carry0)
            u_fin_k, v_fin_k, t_fin_k, s_fin_k = fin[:4]
            ux_f, vx_f, tx_f, sx_f = fin[4:8]
            comp_flag, reset_flag = fin[8], fin[9]
            hmixn, kmixn = fin[11], fin[12]
            f_used = fin[13]
            rho0_fin, cp0_fin = fin[14], fin[15]

        if with_diags:
            # ---- final full pass: last pass + diagnostics ------------------
            csc_f = colscal_of(f_used)
            outs = run_pass(fullp, ux_f, vx_f, tx_f, sx_f,
                            ux_f, vx_f, tx_f, sx_f, csc_f)
            colout = outs[4]
            (u_p, v_p, t_p, s_p, difm, difs, dift, ghat, rho, cp,
             talpha, sbeta, buoy, rig, dbloc, shsq, wxnt_t, swdk_opt,
             tinc, sinc, ocntcorr, scorr) = [
                tob(a) for a in outs[:4] + outs[5:]]
            rhoh2o = co(colout, 2)
            fcorr = co(colout, 3)
            wu0x, wu0y = co(colout, 4), co(colout, 5)
            wx0t, wx0s, wx0b = co(colout, 6), co(colout, 7), co(colout, 8)

            # ---- diagnostic fluxes (:242-256); batch layout (ncol, wz) -----
            li = jax.lax.broadcasted_iota(jnp.int32, (1, wz), 1)
            intm = (li >= 1) & (li <= nz)
            deltaz = 0.5 * (fp._shr(hm_row, 1) + hm_row)   # interface lane i
            dz_safe = jnp.where(intm, deltaz, 1.0)
            dif_x = dift if ph.ldd else difs
            wx1 = -dif_x * ((fp._shr(t_p, 1) - t_p) / dz_safe
                            - ghat * wx0t[:, None])
            wx2 = -difs * ((fp._shr(s_p, 1) - s_p) / dz_safe
                           - ghat * wx0s[:, None])
            wxb = flags.grav * (fp._shr(talpha, 1) * wx1
                            - fp._shr(sbeta, 1) * wx2)
            wu1 = -difm * (fp._shr(u_p, 1) - u_p) / dz_safe
            wu2 = -difm * (fp._shr(v_p, 1) - v_p) / dz_safe

            def iface(surface, interior):
                prof = jnp.where(li == 0, surface[:, None],
                                 jnp.where(intm, interior, 0.0))
                return prof[:, :nz + 1]

            wu = jnp.stack([iface(wu0x, wu1), iface(wu0y, wu2)], axis=-1)
            wx = jnp.stack([iface(wx0t, wx1), iface(wx0s, wx2),
                            iface(wx0b, wxb)], axis=-1)

            # ---- surface references + damping (:305-340) -------------------
            u_lvl = u_p[:, :nzp1]
            v_lvl = v_p[:, :nzp1]
            t_lvl = t_p[:, :nzp1]
            s_lvl = s_p[:, :nzp1]
        else:
            # prognostic-only: the loop's merged solve outputs ARE the final
            # state (the materialization pass reproduces them bitwise — the
            # under-relaxation is idempotent at its fixed point)
            u_lvl = tob(u_fin_k)[:, :nzp1]
            v_lvl = tob(v_fin_k)[:, :nzp1]
            t_lvl = tob(t_fin_k)[:, :nzp1]
            s_lvl = tob(s_fin_k)[:, :nzp1]
        if ph.l_ssref:
            ssurf = prm.ssref
        else:
            ssurf = s_lvl[:, 0] + prm.sref
        dampu_flag = jnp.zeros((ncol,), dtype)
        dampv_flag = jnp.zeros((ncol,), dtype)
        if cfg.forcing.l_damp_curr:
            r = cfg.forcing.dtuvdamp * (86400.0 / dto)

            def damp(q):
                a = 0.99 * jnp.abs(q)
                b = q * q / r
                qi = jnp.minimum(a, b)
                frac = (b < a).astype(dtype).sum(axis=1) / float(nzp1)
                return q - jnp.sign(q) * qi, frac

            u_lvl, dampu_flag = damp(u_lvl)
            v_lvl, dampv_flag = damp(v_lvl)

        # ---- history ping-pong (:343-353) ----------------------------------
        u3 = jnp.stack([u_lvl, v_lvl], axis=-1)
        x3 = jnp.stack([t_lvl, s_lvl], axis=-1)
        old2 = new
        new2 = 1 - old2
        sel2 = (new2 == 1)[:, None, None]
        us = jnp.stack([jnp.where(sel2, st.us[..., 0], u3),
                        jnp.where(sel2, u3, st.us[..., 1])], axis=-1)
        xs = jnp.stack([jnp.where(sel2, st.xs[..., 0], x3),
                        jnp.where(sel2, x3, st.xs[..., 1])], axis=-1)
        selh = (new2 == 1)[:, None]
        hmixd = jnp.stack([jnp.where(selh[:, 0], st.hmixd[:, 0], hmixn),
                           jnp.where(selh[:, 0], hmixn, st.hmixd[:, 1])],
                          axis=-1)

        if with_diags:
            new_st = dataclasses.replace(
                st, u=u3, x=x3, us=us, xs=xs, hmixd=hmixd, old=old2,
                new=new2, hmix=hmixn, kmix=kmixn,
                rho=rho[:, :nzp1], cp=cp[:, :nzp1], buoy=buoy[:, :nzp1],
                talpha=talpha[:, :nzp1], sbeta=sbeta[:, :nzp1],
                rhoh2o=rhoh2o,
                difm=difm[:, :nz + 2], difs=difs[:, :nz + 2],
                dift=dift[:, :nz + 2], ghat=ghat[:, :nz + 1],
                rig=rig[:, :nz + 1], dbloc=dbloc[:, :nz + 1],
                shsq=shsq[:, :nz + 1], wu=wu, wx=wx,
                wxnt=st.wxnt.at[:, :, 0].set(wxnt_t[:, :nz + 1]),
                swdk_opt=swdk_opt[:, :nz + 1],
                tinc_fcorr=tinc[:, :nzp1], sinc_fcorr=sinc[:, :nzp1],
                ocntcorr=ocntcorr[:, :nzp1], scorr=scorr[:, :nzp1],
                fcorr=fcorr,
                uref=u_lvl[:, 0], vref=v_lvl[:, 0], tref=t_lvl[:, 0],
                ssurf=jnp.asarray(ssurf, dtype), reset_flag=reset_flag,
                dampu_flag=dampu_flag, dampv_flag=dampv_flag)
        else:
            # wide diagnostic fields keep their previous values; the
            # surface rho/cp rows are refreshed from the loop carry so the
            # next flux update's ntflux (forcing.py:69-75) sees exactly
            # what the materialization pass would have produced
            new_st = dataclasses.replace(
                st, u=u3, x=x3, us=us, xs=xs, hmixd=hmixd, old=old2,
                new=new2, hmix=hmixn, kmix=kmixn,
                rho=st.rho.at[:, 0].set(rho0_fin),
                cp=st.cp.at[:, 0].set(cp0_fin),
                uref=u_lvl[:, 0], vref=v_lvl[:, 0], tref=t_lvl[:, 0],
                ssurf=jnp.asarray(ssurf, dtype), reset_flag=reset_flag,
                dampu_flag=dampu_flag, dampv_flag=dampv_flag)
        return new_st, comp_flag

    return step_fn
