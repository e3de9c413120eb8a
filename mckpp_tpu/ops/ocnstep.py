"""Per-column ocean step: semi-implicit iteration with under-relaxation,
mixed-layer-depth convergence, and the computational-instability trap.

Reimplements mckpp_physics_ocnstep_mod.F90:43-357:

* extrapolate the new profiles from the two-level history (:91-112);
* 3 compulsory smoothed iterations (lambda = 0.5) of
  {vertical mixing -> implicit integration} (:122-135);
* iterate until the boundary-layer depth converges within
  ``hmixtolfrac * hm(kmix)`` on 3 consecutive passes (iconv >= 3), up to
  itermax — continuing past itermax only while hmix deepens (:140-192);
* instability trap: if any |U| >= 10, |dT| >= 10 or the depth-weighted RMS
  difference from the old profiles exceeds 1, reset to the history, perturb
  the Coriolis term by 1.01 per offending check, and retry (<= 10 times)
  (:200-236);
* diagnostic fluxes, optional current damping, and the old/new history
  ping-pong (:242-353).

This is written for a *single column* with ordinary lax control flow; the
model layer vmaps it over the column batch, which gives exactly the
reference's per-column early-exit semantics (JAX's batching rule for
while_loop applies masked updates).  ``active`` gates the loop conditions so
land columns cannot spin.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .. import constants as c
from ..config import KppConfig
from ..state import State, ColumnParams, Forcing
from .ocnint import ocnint
from .vmix import vmix


def _apply_vm(st: State, vm) -> State:
    return dataclasses.replace(
        st, rho=vm.rho, cp=vm.cp, talpha=vm.talpha, sbeta=vm.sbeta,
        buoy=vm.buoy, rhoh2o=vm.rhoh2o, difm=vm.difm, difs=vm.difs,
        dift=vm.dift, ghat=vm.ghat, rig=vm.rig, dbloc=vm.dbloc,
        shsq=vm.shsq, wu=st.wu.at[0].set(vm.wu0), wx=st.wx.at[0].set(vm.wx0),
        wxnt=vm.wxnt, swdk_opt=vm.swdk_opt,
        uref=vm.uref, vref=vm.vref)


def ocnstep(stt: State, prm: ColumnParams, frc: Forcing, grid, wmt, wst,
            cfg: KppConfig, first_step, active) -> tuple[State, jax.Array]:
    """Advance one column by one ocean timestep.

    Returns (new_state, comp_flag): comp_flag True means the integration
    failed to stabilize and check_profile should reset the column.
    """
    ph = cfg.physics
    dto = cfg.time.dto
    nz = grid.nz
    nzp1 = nz + 1
    dtype = grid.zm.dtype
    lam = c.LAMBDA_SMOOTH

    uo = stt.u
    xo = stt.x

    # repair out-of-range history phase (reference :93-102)
    old, new = stt.old, stt.new
    old = jnp.where((old < 0) | (old > 1), new, old)
    new = jnp.where((new < 0) | (new > 1), old, new)
    stt = dataclasses.replace(stt, old=old, new=new,
                              reset_flag=jnp.zeros((), dtype),
                              dampu_flag=jnp.zeros((), dtype),
                              dampv_flag=jnp.zeros((), dtype))

    def run_vmix(st: State):
        return vmix(st.u, st.x, frc.sflux, st.ssurf, prm.sref, prm.jerlov,
                    prm.f, prm.ocdepth, jnp.asarray(False),
                    st.swdk_opt, st.swfrac, st.wxnt, first_step,
                    grid, wmt, wst,
                    lri=ph.lri, ldd=ph.ldd, lkpp=ph.lkpp,
                    cst=cfg.constants)

    def run_ocnint(st: State, f_local, kmixe):
        oi = ocnint(st.u, st.x, uo, xo, f_local, kmixe,
                    st.difm, st.difs, st.dift, st.ghat, st.wxnt,
                    st.wu[0], st.wx[0], st.rho, st.cp,
                    frc.sst0, frc.fcorr_twod, frc.fcorr_withz,
                    frc.sfcorr_withz, frc.ocnt_clim, frc.sal_clim,
                    prm.relax_sst, prm.relax_ocnt, prm.relax_sal, st.fcorr,
                    prm.nmodeadv, prm.modeadv, prm.advection,
                    grid, dto,
                    l_relax_sst=cfg.boundary.l_relax_sst,
                    l_relax_calconly=cfg.boundary.l_relax_calconly,
                    l_fcorr=cfg.forcing.l_fcorr,
                    l_fcorr_withz=cfg.forcing.l_fcorr_withz,
                    l_sfcorr_withz=cfg.forcing.l_sfcorr_withz,
                    l_relax_sal=cfg.boundary.l_relax_sal,
                    l_relax_ocnt=cfg.boundary.l_relax_ocnt,
                    l_advect=cfg.boundary.l_advect,
                    solver=ph.solver)
        return dataclasses.replace(
            st, u=oi.u, x=oi.x, tinc_fcorr=oi.tinc_fcorr,
            sinc_fcorr=oi.sinc_fcorr, ocntcorr=oi.ocntcorr, scorr=oi.scorr,
            fcorr=oi.fcorr)

    def one_pass(st, ux, xx, f_local):
        """Under-relax, then vmix + ocnint (reference :122-135 body)."""
        u = lam * ux + (1.0 - lam) * st.u
        x = lam * xx + (1.0 - lam) * st.x
        st = dataclasses.replace(st, u=u, x=x)
        vm = run_vmix(st)
        st = _apply_vm(st, vm)
        st = run_ocnint(st, f_local, vm.kbl)
        return st, u, x, vm.hbl, vm.kbl

    def integrate(st0: State, f_local):
        """One full semi-implicit integration attempt."""
        # extrapolation from the two-level history (:103-111)
        u = 2.0 * st0.us[..., new] - st0.us[..., old]
        x = 2.0 * st0.xs[..., new] - st0.xs[..., old]
        st = dataclasses.replace(st0, u=u, x=x)
        ux, xx = u, x
        hmixe = jnp.zeros((), dtype)
        kmixe = jnp.asarray(nz, jnp.int32)
        for _ in range(3):              # compulsory iterations (:122-135)
            st, ux, xx, hmixe, kmixe = one_pass(st, ux, xx, f_local)
        hmixn, kmixn = hmixe, kmixe

        if ph.lkpp:
            # hmix convergence loop (:140-192)
            def cond(carry):
                return carry[-1]

            def body(carry):
                st, ux, xx, hmixe, kmixe, hmixn, kmixn, it, iconv, _ = carry
                st, ux, xx, hmixn, kmixn = one_pass(st, ux, xx, f_local)
                it = it + 1
                tol = ph.hmixtolfrac * jnp.where(
                    kmixn == nzp1, grid.hm[nz - 1], grid.hm[kmixn - 1])
                iconv = jnp.where(jnp.abs(hmixn - hmixe) > tol, 0, iconv + 1)
                cont = (iconv < 3) & ((it < ph.itermax) | (hmixn > hmixe)) \
                    & (it < ph.itermax + ph.extra_iters) & active
                hmixe = jnp.where(cont, hmixn, hmixe)
                kmixe = jnp.where(cont, kmixn, kmixe)
                return (st, ux, xx, hmixe, kmixe, hmixn, kmixn, it, iconv, cont)

            carry = (st, ux, xx, hmixn, kmixn, hmixn, kmixn,
                     jnp.asarray(3, jnp.int32), jnp.asarray(0, jnp.int32),
                     active)
            carry = jax.lax.while_loop(cond, body, carry)
            st, _, _, _, _, hmixn, kmixn = carry[:7]
        return st, hmixn, kmixn

    # ---- instability trap (outer retry loop, :89 & :194-236) -------------
    def instability(st):
        du = jnp.abs(st.u[:nz, :])                  # levels 1..nz
        dx = jnp.abs(st.x[:nz, 0] - st.x[1:, 0])
        bad = (du[:, 0] >= 10.0) | (du[:, 1] >= 10.0) | (dx >= 10.0)
        nbad = bad.sum()
        blown = bad.any()
        w = grid.hm / grid.dm[nz]                   # hm(k)/dm(NZ)
        rmsd = jnp.sqrt(jnp.stack([
            ((st.u[:, 0] - uo[:, 0]) ** 2 * w).sum(),
            ((st.u[:, 1] - uo[:, 1]) ** 2 * w).sum(),
            ((st.x[:, 0] - xo[:, 0]) ** 2 * w).sum(),
            ((st.x[:, 1] - xo[:, 1]) ** 2 * w).sum()]))
        exceed = rmsd >= jnp.asarray(c.RMSD_THRESHOLD, dtype)
        nexceed = jnp.where(blown, 0, exceed.sum())
        comp = blown | (~blown & exceed.any())
        # f is multiplied by 1.01 once per offending level/metric
        fmul = 1.01 ** (nbad + nexceed).astype(dtype)
        return comp, fmul

    def outer_cond(carry):
        st, f_local, comp, reset, hmixn, kmixn = carry
        return comp & (reset <= float(c.COMP_ITER_MAX)) & active

    def outer_body(carry):
        st, f_local, comp, reset, _, _ = carry
        st, hmixn, kmixn = integrate(st, f_local)
        comp, fmul = instability(st)
        f_local = f_local * jnp.where(comp, fmul, 1.0)
        reset = reset + 1.0
        return (st, f_local, comp, reset, hmixn, kmixn)

    carry0 = (stt, prm.f, jnp.asarray(True), jnp.zeros((), dtype),
              jnp.zeros((), dtype), jnp.asarray(nz, jnp.int32))
    st, f_final, comp_flag, reset_flag, hmixn, kmixn = jax.lax.while_loop(
        outer_cond, outer_body, carry0)

    # ---- diagnostic fluxes (:242-256) ------------------------------------
    hm, zm = grid.hm, grid.zm
    j = jnp.arange(1, nz + 1)
    deltaz = 0.5 * (hm[:nz] + hm[1:])
    dif_x = st.difs[1:nz + 1]
    wx1 = -dif_x * ((st.x[:nz, 0] - st.x[1:, 0]) / deltaz
                    - st.ghat[1:] * st.wx[0, 0])
    wx2 = -dif_x * ((st.x[:nz, 1] - st.x[1:, 1]) / deltaz
                    - st.ghat[1:] * st.wx[0, 1])
    if ph.ldd:
        wx1 = -st.dift[1:nz + 1] * ((st.x[:nz, 0] - st.x[1:, 0]) / deltaz
                                    - st.ghat[1:] * st.wx[0, 0])
    wxb = cfg.constants.grav * (st.talpha[:nz] * wx1 - st.sbeta[:nz] * wx2)
    wu1 = -st.difm[1:nz + 1] * (st.u[:nz, 0] - st.u[1:, 0]) / deltaz
    wu2 = -st.difm[1:nz + 1] * (st.u[:nz, 1] - st.u[1:, 1]) / deltaz
    wx = st.wx.at[1:, 0].set(wx1).at[1:, 1].set(wx2).at[1:, 2].set(wxb)
    wu = st.wu.at[1:, 0].set(wu1).at[1:, 1].set(wu2)

    # ---- surface references (:305-314) -----------------------------------
    u, x = st.u, st.x
    if cfg.physics.l_ssref:
        ssurf = prm.ssref
    else:
        ssurf = x[0, 1] + prm.sref
    dampu_flag = st.dampu_flag
    dampv_flag = st.dampv_flag

    # ---- current damping (:317-340) --------------------------------------
    if cfg.forcing.l_damp_curr:
        r = cfg.forcing.dtuvdamp * (86400.0 / dto)
        a = 0.99 * jnp.abs(u)
        b = u * u / r
        ui = jnp.minimum(a, b)
        frac = (b < a).astype(dtype).sum(axis=0) / float(nzp1)
        u = u - jnp.sign(u) * ui
        dampu_flag = frac[0]
        dampv_flag = frac[1]

    # ---- history ping-pong (:343-353) ------------------------------------
    old2 = new
    new2 = 1 - old2
    us = st.us.at[:, :, new2].set(u)
    xs = st.xs.at[:, :, new2].set(x)
    hmixd = st.hmixd.at[new2].set(hmixn)

    st = dataclasses.replace(
        st, u=u, x=x, us=us, xs=xs, hmixd=hmixd, old=old2, new=new2,
        hmix=hmixn, kmix=kmixn, wu=wu, wx=wx,
        uref=u[0, 0], vref=u[0, 1], tref=x[0, 0],
        ssurf=jnp.asarray(ssurf, dtype),
        reset_flag=reset_flag, dampu_flag=dampu_flag, dampv_flag=dampv_flag)
    return st, comp_flag
