"""Vertical-mixing interface: EOS profiles, kinematic surface fluxes,
bulk-Richardson inputs, and the kppmix scheme driver.

Reimplements mckpp_physics_verticalmixing_mod.F90:14-161 and
mckpp_physics_verticalmixing_kppmix_mod.F90:25-126 as a pure per-column
function (vmapped over columns by the model layer).

The non-turbulent (penetrating solar) flux update is folded in exactly where
the reference calls MCKPP_FLUXES_NTFLUX (mckpp_fluxes_mod.F90:93-118): the
swdk_opt cache is rebuilt when ``first_step`` and wXNT is refreshed from the
current rho/cp every call.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as c
from .bldepth import bldepth
from .blmix import blmix, enhance
from .ddmix import ddmix
from .eos import abk80, cpsw, sig80
from .rimix import rimix
from .swfrac import swdk

_EPSLN = 1.0e-20


class VmixResult(NamedTuple):
    hbl: jax.Array
    kbl: jax.Array           # int32, Fortran level index
    rho: jax.Array           # (nzp1,)
    cp: jax.Array
    talpha: jax.Array
    sbeta: jax.Array
    buoy: jax.Array
    rhoh2o: jax.Array
    difm: jax.Array          # (nz+2,)
    difs: jax.Array
    dift: jax.Array
    ghat: jax.Array          # (nz+1,)
    rig: jax.Array           # (nz+1,)
    dbloc: jax.Array
    shsq: jax.Array
    wu0: jax.Array           # (2,) kinematic surface momentum flux
    wx0: jax.Array           # (3,) kinematic surface T, S, buoyancy fluxes
    wxnt: jax.Array          # (nz+1, 2)
    swdk_opt: jax.Array      # (nz+1,)
    ustar: jax.Array
    uref: jax.Array          # scratch reference velocities (last level's)
    vref: jax.Array


def vmix(u, x, sflux, ssurf, sref, jerlov, f, ocdepth, l_initflag,
         swdk_opt_cached, swfrac_cached, wxnt_prev, first_step,
         grid, wmt, wst, *, lri=True, ldd=False, lkpp=True,
         update_wxnt=True, cst=c.Constants()):
    """One vertical-mixing evaluation for a single column.

    u: (nzp1,2); x: (nzp1,2) with x[:,0]=T, x[:,1]=S-Sref;
    sflux: (6,) packed surface fluxes; grid: VerticalGrid.
    Static flags lri/ldd/lkpp specialize the jitted computation
    (reference LRI/LDD/LKPP process switches).
    """
    zm, hm, dm = grid.zm, grid.hm, grid.dm
    nz = zm.shape[0] - 1
    dtype = zm.dtype

    # fresh-water and brine densities in the surface layer
    s0t, _ = sig80(jnp.asarray(0.0, dtype), x[0, 0], -zm[0])
    rhoh2o = 1000.0 + s0t
    s0b, _ = sig80(jnp.asarray(cst.sice, dtype), x[0, 0], -zm[0])
    rhob = 1000.0 + s0b

    # EOS on every level (reference :59-73); pressure = -zm (dbar)
    alpha, beta, _, sig0, _ = abk80(x[:, 1] + sref, x[:, 0], -zm)
    rho = 1000.0 + sig0
    cp = cpsw(x[:, 1] + sref, x[:, 0], -zm)
    talpha = alpha
    sbeta = beta
    buoy = -cst.grav * sig0 / 1000.0

    # non-turbulent solar flux profile (ntflux); swdk cache at interfaces
    swdk_opt = jnp.where(first_step,
                         swdk(-dm, jerlov), swdk_opt_cached)
    if update_wxnt:   # static: False only for the pre-run initial vmix
        wxnt = wxnt_prev.at[:, 0].set(-sflux[2] * swdk_opt / (rho[0] * cp[0]))
    else:
        wxnt = wxnt_prev

    # kinematic surface fluxes (reference :81-100)
    wu0 = jnp.stack([-sflux[0] / rho[0], -sflux[1] / rho[0]])
    tau = jnp.sqrt(sflux[0] ** 2 + sflux[1] ** 2) + 1.0e-16
    ustar = jnp.sqrt(tau / rho[0])
    wx0_t = -sflux[3] / rho[0] / cp[0]
    wx0_s = ssurf * sflux[5] / rhoh2o + (ssurf - cst.sice) * sflux[4] / rhob
    b0 = -cst.grav * (talpha[0] * wx0_t - sbeta[0] * wx0_s)
    wx0 = jnp.stack([wx0_t, wx0_s, -b0])
    b0sol = cst.grav * talpha[0] * sflux[2] / (rho[0] * cp[0])

    # buoyancy-gradient contributions on interfaces (for ddmix)
    alpha_dt = jnp.zeros(nz + 1, dtype=dtype)
    beta_ds = jnp.zeros(nz + 1, dtype=dtype)
    alpha_dt = alpha_dt.at[1:].set(
        0.5 * (talpha[:-1] + talpha[1:]) * (x[:-1, 0] - x[1:, 0]))
    beta_ds = beta_ds.at[1:].set(
        0.5 * (sbeta[:-1] + sbeta[1:]) * (x[:-1, 1] - x[1:, 1]))

    # reference velocity/buoyancy and bulk-Richardson inputs (:110-137).
    # For each level n, the reference integrates a trapezoid average from
    # the surface down to zref = epsilon*zm(n).  All but the last active
    # layer contribute their full trapezoid, so the inner kl-loop collapses
    # to a prefix sum over full-layer trapezoids plus one partial-layer
    # term located by searchsorted — O(nz) instead of O(nz^2) and no
    # (nz, nz) temporaries in HBM.
    zref = c.EPSILON_KPP * zm[:nz]                     # (nz,)
    wz0 = jnp.maximum(zm[0], zref)
    dz_lay = zm[:nz] - zm[1:nz + 1]                    # layer extents
    # k* = largest python k with zm[k] > zref (the partial layer); -1 if none
    kstar = jnp.searchsorted(-zm, -zref, side="left") - 1
    has = kstar >= 0
    ks = jnp.clip(kstar, 0, nz - 1)
    wz_p = zm[ks] - zref
    del_p = 0.5 * wz_p / dz_lay[ks]

    def ref_avg(prof):
        top = prof[0] * wz0 / zref
        tfull = dz_lay * 0.5 * (prof[:nz] + prof[1:nz + 1])
        csum = jnp.concatenate([jnp.zeros(1, dtype=tfull.dtype),
                                jnp.cumsum(tfull)])
        partial = wz_p * (prof[ks] + del_p * (prof[ks + 1] - prof[ks]))
        contrib = jnp.where(has, csum[ks] + partial, 0.0)
        return top - contrib / zref

    uref = ref_avg(u[:, 0])
    vref = ref_avg(u[:, 1])
    bref = ref_avg(buoy)

    ritop = (zref - zm[:nz]) * (bref - buoy[:nz])      # (nz,) 0-based levels
    dbloc = jnp.zeros(nz + 1, dtype=dtype)
    dbloc = dbloc.at[1:].set(buoy[:-1] - buoy[1:])
    dvsq = jnp.zeros(nz + 1, dtype=dtype)
    dvsq_lvl = (uref - u[:nz, 0]) ** 2 + (vref - u[:nz, 1]) ** 2
    shsq = jnp.zeros(nz + 1, dtype=dtype)
    shsq = shsq.at[1:].set((u[:-1, 0] - u[1:, 0]) ** 2 + (u[:-1, 1] - u[1:, 1]) ** 2)

    # ---- kppmix (reference kppmix_mod.F90:64-124) ------------------------
    if lri:
        difm, difs, dift, rig = rimix(dbloc, shsq, zm)
    else:
        difm = jnp.zeros(nz + 2, dtype=dtype)
        difs = jnp.zeros(nz + 2, dtype=dtype)
        dift = jnp.zeros(nz + 2, dtype=dtype)
        rig = jnp.zeros(nz + 1, dtype=dtype)
    if ldd:
        difs, dift = ddmix(alpha_dt, beta_ds, difs, dift)
    # fill the bottom kmp1 coefficients for blmix
    difm = difm.at[nz + 1].set(difm[nz])
    difs = difs.at[nz + 1].set(difs[nz])
    dift = dift.at[nz + 1].set(dift[nz])

    if lkpp:
        hbl, bfsfc, stable, case_a, kbl = bldepth(
            dvsq_lvl, ritop, dbloc, ustar, b0, b0sol, swfrac_cached,
            jerlov, f, ocdepth, l_initflag, zm, hm, wmt, wst, vonk=cst.vonk)
        blmc, ghat, dkm1 = blmix(difm, difs, dift, ustar, bfsfc, hbl,
                                 stable, case_a, kbl, zm, hm, wmt, wst,
                                 vonk=cst.vonk)
        blmc, ghat = enhance(difm, difs, dift, dkm1, hbl, kbl, case_a,
                             blmc, ghat, zm)
        # merge boundary-layer and interior coefficients
        ki = jnp.arange(nz + 2)
        inside = (ki >= 1) & (ki < kbl) & (ki <= nz)
        difm = jnp.where(inside, jnp.pad(blmc[:, 0], (0, 1)), difm)
        difs = jnp.where(inside, jnp.pad(blmc[:, 1], (0, 1)), difs)
        dift = jnp.where(inside, jnp.pad(blmc[:, 2], (0, 1)), dift)
        kg = jnp.arange(nz + 1)
        ghat = jnp.where((kg >= kbl) & (kg <= nz), 0.0, ghat)
    else:
        hbl = -zm[nz - 1]
        kbl = jnp.asarray(nz, jnp.int32)
        ghat = jnp.zeros(nz + 1, dtype=dtype)

    # bottom diffusivity limits + no ghat through the bottom (:151-159)
    difm = difm.at[nz].set(c.VLIMIT_BOTTOM).at[nz + 1].set(c.VLIMIT_BOTTOM)
    difs = difs.at[nz].set(c.DLIMIT_BOTTOM).at[nz + 1].set(c.DLIMIT_BOTTOM)
    dift = dift.at[nz].set(c.DLIMIT_BOTTOM).at[nz + 1].set(c.DLIMIT_BOTTOM)
    ghat = ghat.at[nz].set(0.0)

    return VmixResult(
        hbl=hbl, kbl=kbl, rho=rho, cp=cp, talpha=talpha, sbeta=sbeta,
        buoy=buoy, rhoh2o=rhoh2o, difm=difm, difs=difs, dift=dift,
        ghat=ghat, rig=rig, dbloc=dbloc, shsq=shsq, wu0=wu0, wx0=wx0,
        wxnt=wxnt, swdk_opt=swdk_opt, ustar=ustar,
        uref=uref[nz - 1], vref=vref[nz - 1])
