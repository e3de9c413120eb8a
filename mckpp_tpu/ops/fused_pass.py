"""Fused one-pass kernel: {under-relax -> vertical mixing -> implicit solve}
for the whole column batch in one Pallas TPU kernel.

This is the performance core of the framework.  One "pass" is the body of the
reference's semi-implicit iteration (mckpp_physics_ocnstep_mod.F90:122-135):
under-relaxation, the full vertical-mixing coefficient pipeline
(EOS -> rimix/ddmix -> bldepth -> blmix -> enhance, from
mckpp_physics_verticalmixing_*.F90), and the backward-Euler tridiagonal solves
(mckpp_physics_ocnint_mod.F90) — executed ~5-9 times per column per timestep.
The unfused XLA path materializes ~50 (ncol, nz) intermediates in HBM per
pass; fusing the pass into one kernel keeps everything in VMEM and is HBM-
bound only on the true input/output state (~15 arrays).

Layout (static ``zaxis``; see PhysicsFlags.pass_layout):

* ``zaxis=0`` (**default, "col_lanes"**): profiles are ``(WZ, ncol)`` —
  columns on the 128 vector lanes (always fully occupied), z on sublanes.
  Measured 2.6x faster than zaxis=1 at nz=69 (BASELINE.md roofline): with z
  on lanes the vector registers are only wz/128 occupied.  The state stays
  ``(ncol, ...)`` outside the kernel; transposes happen once per step.
* ``zaxis=1`` ("z_lanes"): profiles ``(ncol, WZ)``, z on lanes — kept for
  comparison and as the layout reference.

All vertical operations are z-axis ops in either layout:

* level shifts   -> static shifts (concatenate of a zero slice);
* prefix scans   -> log-depth shift-and-combine (bldepth's Rib recurrence);
* tridiag solve  -> parallel cyclic reduction (log-depth shifts);
* per-column level gathers (e.g. diffusivities at ``kbl``) -> one-hot
  masked z reductions;
* the reference-profile trapezoid average (verticalmixing_mod.F90:110-137)
  is **linear in the profile**, so it is a single precomputed
  ``(nz+2, nz+2)`` matrix applied on the MXU.

The kernel body (:func:`_pass_body`) is pure jnp, so the identical code runs
three ways: under ``pl.pallas_call`` (production TPU path), as a plain traced
XLA function (CPU / float64 parity path), and in Pallas interpret mode
(tests).  Oracle tests compare it against the per-column ops in ``vmix.py`` /
``ocnint.py``.

Index conventions (lane ``j`` of a ``(B, WZ)`` array, ``WZ = nz + 2``):

* level arrays (u, x, rho, zm, hm, swfrac): lane ``j`` = python level ``j``
  = Fortran level ``j+1``; lanes ``> nz`` are padding.
* Fortran-aligned interface arrays (difm/difs/dift 0:nzp1, ghat/dbloc/shsq/
  rig/wxnt/swdk_opt/dm/tri 0:nz): lane ``j`` = Fortran interface ``j``.
* tridiagonal row arrays (cu/cc/cl/rhs/solution): lane ``j`` = Fortran row
  ``j+1``; valid lanes ``0..nz-1``.
* bldepth per-level arrays: lane ``j`` = the Fortran ``kl`` loop index
  directly (valid ``2..nz``).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as c
from .eos import abk80, cpsw
from .wscale import wscale_nodal, wscale_analytic

_EPS16 = 1.0e-16
_EPS20 = 1.0e-20
_BIG = 1.0e30


@dataclasses.dataclass(frozen=True)
class PassFlags:
    """Static feature flags specializing the fused pass (subset of the
    reference's L_* switches that the kernel supports; only the
    resident-table wscale falls back to the unfused path)."""
    lri: bool = True
    ldd: bool = False
    lkpp: bool = True
    l_relax_sst: bool = False
    l_relax_calconly: bool = False
    l_fcorr: bool = False
    l_fcorr_withz: bool = False
    l_sfcorr_withz: bool = False
    l_relax_sal: bool = False
    l_relax_ocnt: bool = False
    # steady advection corrections of the salinity RHS (rhsmod modes 1-7,
    # solvers.F90:176-335); per-column magnitudes arrive pre-grouped by
    # mode in colscal rows CS_ADV1..CS_ADV7
    l_advect: bool = False
    # "nodal" = the reference's bilinear table interpolation computed
    # gather-free (bit-matches the resident table); "analytic" = the exact
    # LMD stability functions the table discretizes — 4x fewer node
    # evaluations, scientifically equivalent (the table is itself only an
    # approximation of these formulas), ~1e-3 relative difference in wm/ws
    wscale: str = "nodal"
    # NAME_CONSTANTS-overridable physical constants reaching the kernel
    # (mckpp_initialize_namelist_mod.F90:92-107); trace-time floats
    grav: float = c.GRAV
    vonk: float = c.VONK
    sice: float = c.SICE


# colscal row indices (packed per-column scalars)
CS_TAUX, CS_TAUY, CS_SWF, CS_NSOL, CS_ICE, CS_RAIN = 0, 1, 2, 3, 4, 5
CS_SSURF, CS_SREF, CS_F, CS_OCDEPTH = 6, 7, 8, 9
CS_RFAC, CS_A1, CS_A2, CS_FIRST = 10, 11, 12, 13
CS_RELAX_SST, CS_SST0, CS_FCORR2D, CS_RELAX_OCNT, CS_RELAX_SAL, CS_FCORRP = \
    14, 15, 16, 17, 18, 19
# advection-correction magnitudes grouped by rhsmod mode: row CS_ADV1+m-1
# holds coef_m = sum of advection(im, 2) over entries with modeadv(im, 2)==m
# (the reference's sequential per-im loop, ocnint_mod.F90:179-184, collapses
# to sum_m coef_m * basis_m because addition commutes)
CS_ADV1 = 20
# step-kernel extras: per-column active mask (run_physics) and the previous
# step's surface rho/cp (carried for the lazy-diagnostics ntflux)
CS_ACTIVE, CS_RHO0_IN, CS_CP0_IN = 27, 28, 29
NSC = 32  # padded row count


def _shr(v, s, fill=0.0, axis=1):
    """z-axis shift right: out[j] = v[j-s] (fill for j < s)."""
    if s == 0:
        return v
    if axis == 1:
        z = jnp.full_like(v[:, :s], fill)
        return jnp.concatenate([z, v[:, :-s]], axis=1)
    z = jnp.full_like(v[:s], fill)
    return jnp.concatenate([z, v[:-s]], axis=0)


def _shl(v, s, fill=0.0, axis=1):
    """z-axis shift left: out[j] = v[j+s] (fill for j >= WZ-s)."""
    if s == 0:
        return v
    if axis == 1:
        z = jnp.full_like(v[:, :s], fill)
        return jnp.concatenate([v[:, s:], z], axis=1)
    z = jnp.full_like(v[:s], fill)
    return jnp.concatenate([v[s:], z], axis=0)


def build_ref_matrix(zm: np.ndarray, wz: int) -> np.ndarray:
    """Precompute the (WZ, WZ) matrix A with ``ref_avg(prof) = prof @ A``.

    Column n (0-based level, n < nz) reproduces the reference's trapezoid
    average from the surface to ``zref = epsilon*zm(n+1)``
    (mckpp_physics_verticalmixing_mod.F90:110-137): the surface-layer term,
    the prefix sum of full-layer trapezoids above the partial layer, and the
    partial-layer linear interpolation.  Grid-only — column-independent.
    """
    zm = np.asarray(zm, np.float64)
    nz = zm.shape[0] - 1
    A = np.zeros((wz, wz), np.float64)
    zref = c.EPSILON_KPP * zm[:nz]
    wz0 = np.maximum(zm[0], zref)
    dz_lay = zm[:nz] - zm[1:nz + 1]
    kstar = np.searchsorted(-zm, -zref, side="left") - 1
    for n in range(nz):
        A[0, n] += wz0[n] / zref[n]
        if kstar[n] >= 0:
            ks = min(int(kstar[n]), nz - 1)
            for k in range(ks):
                tf = 0.5 * dz_lay[k] / zref[n]
                A[k, n] -= tf
                A[k + 1, n] -= tf
            wzp = zm[ks] - zref[n]
            delp = 0.5 * wzp / dz_lay[ks]
            A[ks, n] -= wzp * (1.0 - delp) / zref[n]
            A[ks + 1, n] -= wzp * delp / zref[n]
    return A


def _ext(v, idx, li, za=1):
    """Per-column z-gather: out[b] = v[b, idx[b]] (za=1) or v[idx[b], b]
    (za=0), shaped with a singleton z axis."""
    return jnp.sum(jnp.where(li == idx, v, 0.0), axis=za, keepdims=True)


def _pcr_solve(cu, cc, cl, rhs, nz, row, za=1):
    """Parallel cyclic reduction of the batch of tridiagonal systems
    (same elimination order as ops/tridiag.tridmat_pcr, so results are
    bitwise-comparable).  Row arrays on z lanes/sublanes 0..nz-1; padding
    rows are (a=0, b=1, c=0, r=0) no-op rows."""
    shr = partial(_shr, axis=za)
    shl = partial(_shl, axis=za)
    a = jnp.where(row < nz, cu, 0.0)
    b = jnp.where(row < nz, cc, 1.0)
    c_ = jnp.where(row < nz, cl, 0.0)
    r = jnp.where(row < nz, rhs, 0.0)
    s = 1
    while s < nz:
        # one reciprocal of b per level, shifted both ways, instead of
        # two divides (-a/shr(b), -c/shl(b)): divides are ~9x a VPU mul
        # slot (BASELINE.md r5 rates) and PCR held ~half the pass's
        # divide budget.  b==0 only on shifted-in fill (padding rows
        # carry b=1), where alpha/beta multiply a zero anyway.
        rb = 1.0 / jnp.where(b == 0.0, 1.0, b)
        alpha = -a * shr(rb, s, fill=1.0)
        beta = -c_ * shl(rb, s, fill=1.0)
        b = b + alpha * shr(c_, s) + beta * shl(a, s)
        r = r + alpha * shr(r, s) + beta * shl(r, s)
        a = alpha * shr(a, s)
        c_ = beta * shl(c_, s)
        s *= 2
    return r / b


def _tridcof(diff, tdn, tup, nz, row, za=1):
    """Matrix coefficients on z rows (reference solvers.F90:14-44)."""
    shl = partial(_shl, axis=za)
    diff1 = shl(diff, 1)                # diff[i] at row lane i-1
    tdn1 = shl(tdn, 1)
    tup1 = shl(tup, 1)
    cu = jnp.where(row == 0, 0.0, -tup1 * diff)
    cc = 1.0 + tdn1 * diff1 + jnp.where(row == 0, 0.0, tup1 * diff)
    cl = jnp.where(row == nz - 1, 0.0, -tdn1 * diff1)
    return cu, cc, cl


def _tridrhs(hm, yo, ntflux, diff, ghat, sturflux, ghatflux, dto, tdn,
             nz, row, za=1):
    """Scalar RHS on z rows (reference solvers.F90:53-107).  ghat/diff
    lane 0 are zero by construction, so the surface row needs only the
    explicit -sturflux term."""
    shl = partial(_shl, axis=za)
    zs = (lambda v, a, b: v[:, a:b]) if za == 1 else (lambda v, a, b: v[a:b])
    ghterm = ghatflux * (shl(diff, 1) * shl(ghat, 1) - diff * ghat)
    ntterm = shl(ntflux, 1) - ntflux
    rhs = yo + dto / hm * (ghterm + ntterm)
    rhs = rhs + jnp.where(row == 0, -dto / hm * sturflux, 0.0)
    bot = zs(yo, nz, nz + 1) * zs(tdn, nz, nz + 1) * zs(diff, nz, nz + 1)
    return rhs + jnp.where(row == nz - 1, bot, 0.0)


def _pass_body(u, v, t, s, ux, vx, tx, sx, uo, vo, to, so,
               swdk_c, swfrac_c, ocnt_clim, sal_clim, fcorr_z, sfcorr_z,
               colscal, zm, hm, dm, tdn, tup, aref,
               *, nz, flags: PassFlags, dto, full, zaxis=1, zbot=None,
               adv_st=None, f_row=None):
    """One fused pass over a column block.  Layouts (static ``zaxis``):

    * ``zaxis=1``: profiles are ``(B, WZ)`` — z on lanes, columns on
      sublanes (the original layout; 55% lane utilization at nz=69);
    * ``zaxis=0``: profiles are ``(WZ, B)`` — columns on lanes (always a
      full 128-lane vector), z on sublanes.  ``colscal`` is ``(NSC, B)``,
      grid rows are ``(WZ, 1)`` and ``aref`` is pre-transposed.

    Returns a tuple:
    fast: (u', v', t', s', ux', vx', tx', sx', colout8)
    full: (u', v', t', s', colout16, difm, difs, dift, ghat, rho, cp,
           talpha, sbeta, buoy, rig, dbloc, shsq, wxnt_t, swdk_opt,
           tinc, sinc, ocntcorr, scorr)
    """
    za = zaxis
    wz = u.shape[za]
    dtype = u.dtype
    shape_li = (1, wz) if za == 1 else (wz, 1)
    li = jax.lax.broadcasted_iota(jnp.int32, shape_li, za)
    lam = c.LAMBDA_SMOOTH
    shr = partial(_shr, axis=za)
    shl = partial(_shl, axis=za)
    zs = (lambda v, a, b: v[:, a:b]) if za == 1 else (lambda v, a, b: v[a:b])
    hp = jax.lax.Precision.HIGHEST
    if za == 1:
        refdot = lambda prof: jnp.dot(prof, aref, precision=hp)
        cs = lambda k: colscal[:, k:k + 1]
    else:
        refdot = lambda prof: jnp.dot(aref, prof, precision=hp)
        cs = lambda k: colscal[k:k + 1, :]
    ext = partial(_ext, za=za)

    ws_fn = partial(
        wscale_analytic if flags.wscale == "analytic" else wscale_nodal,
        vonk=flags.vonk)

    # ---- under-relaxation (ocnstep :122-129) -----------------------------
    u = lam * ux + (1.0 - lam) * u
    v = lam * vx + (1.0 - lam) * v
    t = lam * tx + (1.0 - lam) * t
    s = lam * sx + (1.0 - lam) * s

    # ---- EOS on every level (verticalmixing :59-73) ----------------------
    sref = cs(CS_SREF)
    s_abs = s + sref
    pr = -zm                              # dbar, grid-row broadcast
    alpha, beta, _, sig0, _ = abk80(s_abs, t, pr)
    rho = 1000.0 + sig0
    cp = cpsw(s_abs, t, pr)
    buoy = -flags.grav * sig0 / 1000.0
    rho0, cp0 = zs(rho, 0, 1), zs(cp, 0, 1)
    ta0, sb0 = zs(alpha, 0, 1), zs(beta, 0, 1)
    # fresh-water / brine surface densities (verticalmixing :44-50)
    t_sfc = zs(t, 0, 1)
    zm_sfc = zs(zm, 0, 1)
    _, _, _, s0t, _ = abk80(jnp.zeros_like(t_sfc), t_sfc, -zm_sfc)
    rhoh2o = 1000.0 + s0t
    _, _, _, s0b, _ = abk80(jnp.full_like(t_sfc, flags.sice), t_sfc, -zm_sfc)
    rhob = 1000.0 + s0b

    # ---- solar decay cache + non-turbulent flux (fluxes :93-137) ---------
    first = cs(CS_FIRST)
    rfac, a1j, a2j = cs(CS_RFAC), cs(CS_A1), cs(CS_A2)
    swdk_new = rfac * jnp.exp(-dm / a1j) + (1.0 - rfac) * jnp.exp(-dm / a2j)
    swdk_opt = first * swdk_new + (1.0 - first) * swdk_c
    swf = cs(CS_SWF)
    wxnt_t = -swf * swdk_opt / (rho0 * cp0)

    # ---- kinematic surface fluxes (verticalmixing :81-100) ---------------
    taux, tauy = cs(CS_TAUX), cs(CS_TAUY)
    wu0x, wu0y = -taux / rho0, -tauy / rho0
    tau = jnp.sqrt(taux ** 2 + tauy ** 2) + _EPS16
    ustar = jnp.sqrt(tau / rho0)
    ssurf = cs(CS_SSURF)
    wx0t = -cs(CS_NSOL) / rho0 / cp0
    wx0s = ssurf * cs(CS_RAIN) / rhoh2o + (ssurf - flags.sice) * cs(CS_ICE) / rhob
    b0 = -flags.grav * (ta0 * wx0t - sb0 * wx0s)
    wx0b = -b0
    b0sol = flags.grav * ta0 * swf / (rho0 * cp0)

    # ---- interface buoyancy-gradient terms for ddmix ---------------------
    if flags.ldd:
        int_mask = (li >= 1) & (li <= nz)
        adt = jnp.where(int_mask,
                        0.5 * (shr(alpha, 1) + alpha) * (shr(t, 1) - t), 0.0)
        bds = jnp.where(int_mask,
                        0.5 * (shr(beta, 1) + beta) * (shr(s, 1) - s), 0.0)

    # ---- reference profiles & bulk-Richardson inputs (:110-137) ----------
    uref = refdot(u)
    vref = refdot(v)
    bref = refdot(buoy)
    zref = c.EPSILON_KPP * zm
    ritop = (zref - zm) * (bref - buoy)            # level lanes 0..nz-1
    imask = (li >= 1) & (li <= nz)
    dbloc = jnp.where(imask, shr(buoy, 1) - buoy, 0.0)
    shsq = jnp.where(imask, (shr(u, 1) - u) ** 2 + (shr(v, 1) - v) ** 2, 0.0)
    dvsq = (uref - u) ** 2 + (vref - v) ** 2       # level lanes 0..nz-1

    # ---- rimix + z121 (rimix_mod, z121_mod) ------------------------------
    if flags.lri:
        dz_int = shr(zm, 1) - zm
        rig = jnp.where(imask, dbloc * dz_int / (shsq + _EPS16), 0.0)
        w = jnp.where((rig < 0.0) | (rig > c.RIINFTY), 0.0, 1.0)
        w = jnp.where(imask, w, 0.0)
        vz = jnp.where(imask, rig, 0.0)
        num = shr(w * vz, 1) + 2.0 * vz + shl(w * vz, 1)
        den = shr(w, 1) + 2.0 + shl(w, 1)
        smooth = jnp.where(imask, num / den, 0.0)
        rigg = jnp.maximum(rig, c.RICON)
        ratio = jnp.minimum((c.RICON - rigg) / c.RICON, 1.0)
        fcon = (1.0 - ratio * ratio) ** 3
        rigg = jnp.maximum(smooth, 0.0)
        ratio = jnp.minimum(rigg / c.RIINFTY, 1.0)
        fri = (1.0 - ratio * ratio) ** 3
        difm = jnp.where(imask, c.DIFMIW + fcon * c.DIFMCON + fri * c.DIFM0, 0.0)
        difs = jnp.where(imask, c.DIFSIW + fcon * c.DIFSCON + fri * c.DIFS0, 0.0)
        dift = difs
    else:
        rig = jnp.zeros_like(u)
        difm = jnp.zeros_like(u)
        difs = jnp.zeros_like(u)
        dift = jnp.zeros_like(u)

    if flags.ldd:
        # double diffusion (ddmix_mod :12-52)
        finger = (adt > bds) & (bds > 0.0)
        safe_bds = jnp.where(finger, bds, 1.0)
        rrho_f = jnp.minimum(adt / safe_bds, c.RRHO0)
        dd = 1.0 - ((rrho_f - 1.0) / (c.RRHO0 - 1.0)) ** 2
        diff_f = c.DSFMAX * dd * dd * dd
        dift = dift + jnp.where(finger, diff_f * 0.8 / rrho_f, 0.0)
        difs = difs + jnp.where(finger, diff_f, 0.0)
        conv = (adt < 0.0) & (bds < 0.0) & (adt < bds)
        safe_bds2 = jnp.where(conv, bds, -1.0)
        rrho_c = adt / safe_bds2
        safe_rrho = jnp.where(conv, rrho_c, 1.0)
        diff_c = 1.5e-6 * 9.0 * 0.101 * jnp.exp(
            4.6 * jnp.exp(-0.54 * (1.0 / safe_rrho - 1.0)))
        prandtl = jnp.where(rrho_c > 0.5,
                            (1.85 - 0.85 / safe_rrho) * rrho_c, 0.15 * rrho_c)
        dift = dift + jnp.where(conv, diff_c, 0.0)
        difs = difs + jnp.where(conv, prandtl * diff_c, 0.0)

    # fill the bottom kmp1 coefficient for blmix matching (kppmix :58-62)
    difm = jnp.where(li == nz + 1, shr(difm, 1), difm)
    difs = jnp.where(li == nz + 1, shr(difs, 1), difs)
    dift = jnp.where(li == nz + 1, shr(dift, 1), dift)

    if flags.lkpp:
        # ---- bldepth (bldepth_mod :32-203); lane j = Fortran kl ----------
        vtc = (c.CV * math.sqrt(0.2 / c.CS / c.EPSILON_KPP)
               / flags.vonk ** 2 / c.RICR)
        f_cor = cs(CS_F) if f_row is None else f_row
        ocdepth = cs(CS_OCDEPTH)
        hek = c.CEKMAN * ustar / (jnp.abs(f_cor) + _EPS16)
        # zbot is a static grid constant (Fortran zm(nzp1) = -dmax): keep it
        # a Python float — a (1, 1) array operand would need a
        # both-axes broadcast, which Mosaic does not implement
        if zbot is None:
            zbot = zs(zm, nz, nz + 1)
        z_kl = shr(zm, 1)                    # zm(kl)
        z_klm1 = shr(zm, 2)                  # zm(kl-1)
        valid = (li >= 2) & (li <= nz)
        bfsfc_l = b0 + b0sol * (1.0 - shr(swfrac_c, 1))
        stable_l = jnp.where(bfsfc_l + _EPS16 >= 0.0, 1.0, 0.0)
        sigma_l = stable_l + (1.0 - stable_l) * c.EPSILON_KPP
        _, ws_l = ws_fn(sigma_l, -z_kl, ustar, bfsfc_l)
        dz_up = z_klm1 - z_kl
        dz_dn = z_kl - zm
        bvsq = 0.5 * (shr(dbloc, 1) / jnp.where(valid, dz_up, 1.0)
                      + dbloc / jnp.where(valid, dz_dn, 1.0))
        vtsq = -z_kl * ws_l * jnp.sqrt(jnp.abs(bvsq)) * vtc
        dmo_raw = c.CMONOB * ustar ** 3 / flags.vonk / (jnp.abs(bfsfc_l) + _EPS16)
        dmo_l = stable_l * dmo_raw - (1.0 - stable_l) * zbot
        hekman_l = stable_l * hek - (1.0 - stable_l) * zbot
        raw = shr(ritop, 1) / (shr(dvsq, 1) + vtsq + _EPS16)
        # log-depth scan of Rib(k) = max(raw_k, Rib(k-1) + eps) (:136-137)
        m_acc = jnp.where(valid, raw, -_BIG)
        c_acc = jnp.where(valid, _EPS16, 0.0)
        step = 1
        while step < wz:
            m_s = shr(m_acc, step, fill=-_BIG)
            c_s = shr(c_acc, step, fill=0.0)
            m_acc, c_acc = jnp.maximum(m_acc, m_s + c_acc), c_s + c_acc
            step *= 2
        rib = jnp.maximum(m_acc, c_acc)
        rib_prev = shr(rib, 1)
        dmo_prev = jnp.where(li == 2, -zbot, shr(dmo_l, 1))
        hri = -z_klm1 + (z_klm1 - z_kl) * (c.RICR - rib_prev) / \
            jnp.where(valid, rib - rib_prev, 1.0)
        slope = (dmo_l - dmo_prev) / jnp.where(valid, z_klm1 - z_kl, 1.0)
        hmonob = jnp.where(dmo_l <= -z_kl,
                           (dmo_l + slope * z_kl) / (1.0 - slope), -zbot)
        hmin = jnp.minimum(jnp.minimum(hri, hmonob),
                           jnp.minimum(hekman_l, -ocdepth))
        # SJW/NPK fix (:161-184); the fused pass never runs at init
        hmin2 = jnp.minimum(jnp.minimum(hri, hmonob), -ocdepth)
        use_fix = (hmin < -z_klm1) & (hmin2 < -z_kl)
        hmin = jnp.where(use_fix, hmin2, hmin)
        crossing = valid & (hmin < -z_kl)
        bigi = jnp.asarray(wz + 100, jnp.int32)
        firstx = jnp.min(jnp.where(crossing, li, bigi), axis=za,
                         keepdims=True)
        found = firstx < bigi
        kbl = jnp.where(found, firstx, nz).astype(jnp.int32)
        hbl = jnp.where(found, ext(hmin, firstx, li), -zs(zm, nz - 1, nz))
        # final surface forcing at hbl (:187-201)
        swdk_hbl = (rfac * jnp.exp(jnp.maximum(-hbl / a1j, c.SWFRAC_RMIN))
                    + (1.0 - rfac) * jnp.exp(jnp.maximum(-hbl / a2j,
                                                         c.SWFRAC_RMIN)))
        bfsfc = b0 + b0sol * (1.0 - swdk_hbl)
        stable = jnp.where(bfsfc >= 0.0, 1.0, 0.0)
        bfsfc = bfsfc + stable * _EPS16
        zm_kbl = ext(zm, kbl - 1, li)
        hm_kbl = ext(hm, kbl - 1, li)
        case_a = jnp.where(-zm_kbl - 0.5 * hm_kbl - hbl >= 0.0, 1.0, 0.0)

        # ---- blmix (blmix_mod :13-151) -----------------------------------
        cg = (c.CSTAR * flags.vonk
              * (c.CS * flags.vonk * c.EPSILON_KPP) ** (1.0 / 3.0))
        sigma_bl = stable * 1.0 + (1.0 - stable) * c.EPSILON_KPP
        wm_h, ws_h = ws_fn(sigma_bl, hbl, ustar, bfsfc)
        kn = jnp.where(case_a + _EPS20 >= 1.0, kbl - 1, kbl)
        hm_kn = ext(hm, kn - 1, li)
        hm_knp1 = ext(hm, kn, li)
        delhat = 0.5 * hm_kn - ext(zm, kn - 1, li) - hbl
        r_frac = 1.0 - delhat / hm_kn

        def match(dif):
            d_m1 = ext(dif, kn - 1, li)
            d_0 = ext(dif, kn, li)
            d_p1 = ext(dif, kn + 1, li)
            dvdzup = (d_m1 - d_0) / hm_kn
            dvdzdn = (d_0 - d_p1) / hm_knp1
            dp = 0.5 * ((1.0 - r_frac) * (dvdzup + jnp.abs(dvdzup))
                        + r_frac * (dvdzdn + jnp.abs(dvdzdn)))
            return dp, d_0 + dp * delhat

        viscp, visch = match(difm)
        difsp, difsh = match(difs)
        diftp, difth = match(dift)
        f1 = stable * c.C1_WS * bfsfc / (ustar ** 4 + _EPS20)
        gat1m = visch / hbl / (wm_h + _EPS20)
        gat1s = difsh / hbl / (ws_h + _EPS20)
        gat1t = difth / hbl / (ws_h + _EPS20)
        dat1m = jnp.minimum(-viscp / (wm_h + _EPS20) + f1 * visch, 0.0)
        dat1s = jnp.minimum(-difsp / (ws_h + _EPS20) + f1 * difsh, 0.0)
        dat1t = jnp.minimum(-diftp / (ws_h + _EPS20) + f1 * difth, 0.0)

        def shape(sig, gat1, dat1):
            return (sig - 2.0) + (3.0 - 2.0 * sig) * gat1 + (sig - 1.0) * dat1

        sig_i = (-shr(zm, 1) + 0.5 * shr(hm, 1)) / hbl     # lane j = ki = j
        sigma_i = stable * sig_i + (1.0 - stable) * jnp.minimum(
            sig_i, c.EPSILON_KPP)
        wm_i, ws_i = ws_fn(sigma_i, hbl, ustar, bfsfc)
        blmc_m = jnp.where(imask, hbl * wm_i * sig_i *
                           (1.0 + sig_i * shape(sig_i, gat1m, dat1m)), 0.0)
        blmc_s = jnp.where(imask, hbl * ws_i * sig_i *
                           (1.0 + sig_i * shape(sig_i, gat1s, dat1s)), 0.0)
        blmc_t = jnp.where(imask, hbl * ws_i * sig_i *
                           (1.0 + sig_i * shape(sig_i, gat1t, dat1t)), 0.0)
        ghat = jnp.where(imask,
                         (1.0 - stable) * cg / (ws_i * hbl + _EPS20), 0.0)
        # diffusivities at grid level kbl-1 (blmix :86-95)
        sig_k = -ext(zm, kbl - 2, li) / hbl
        sigma_k = stable * sig_k + (1.0 - stable) * jnp.minimum(
            sig_k, c.EPSILON_KPP)
        wm_k, ws_k = ws_fn(sigma_k, hbl, ustar, bfsfc)
        dkm1_m = hbl * wm_k * sig_k * (1.0 + sig_k * shape(sig_k, gat1m, dat1m))
        dkm1_s = hbl * ws_k * sig_k * (1.0 + sig_k * shape(sig_k, gat1s, dat1s))
        dkm1_t = hbl * ws_k * sig_k * (1.0 + sig_k * shape(sig_k, gat1t, dat1t))

        # ---- enhance at interface kbl-1 (enhance_mod :10-51) -------------
        ki_e = kbl - 1
        zm_em1 = ext(zm, ki_e - 1, li)
        zm_e = ext(zm, ki_e, li)
        delta = (hbl + zm_em1) / (zm_em1 - zm_e)
        sel = (ki_e >= 1) & (ki_e <= nz - 1) & (li == ki_e)

        def enh(dif, blmc_x, dkm1_x):
            dif_e = ext(dif, ki_e, li)
            dkmp5 = case_a * dif_e + (1.0 - case_a) * ext(blmc_x, ki_e, li)
            dstar = (1.0 - delta) ** 2 * dkm1_x + delta ** 2 * dkmp5
            return (1.0 - delta) * dif_e + delta * dstar

        blmc_m = jnp.where(sel, enh(difm, blmc_m, dkm1_m), blmc_m)
        blmc_s = jnp.where(sel, enh(difs, blmc_s, dkm1_s), blmc_s)
        blmc_t = jnp.where(sel, enh(dift, blmc_t, dkm1_t), blmc_t)
        ghat = jnp.where(sel, (1.0 - case_a) * ghat, ghat)

        # ---- merge boundary-layer and interior (kppmix :100-124) ---------
        inside = (li >= 1) & (li < kbl) & (li <= nz)
        difm = jnp.where(inside, blmc_m, difm)
        difs = jnp.where(inside, blmc_s, difs)
        dift = jnp.where(inside, blmc_t, dift)
        ghat = jnp.where((li >= kbl) & (li <= nz), 0.0, ghat)
    else:
        hbl = -zs(zm, nz - 1, nz) * jnp.ones_like(rho0)
        kbl = jnp.full_like(rho0, nz).astype(jnp.int32)
        ghat = jnp.zeros_like(u)

    # bottom diffusivity limits + no bottom ghat (verticalmixing :151-159)
    botm = li >= nz
    difm = jnp.where(botm, c.VLIMIT_BOTTOM, difm)
    difs = jnp.where(botm, c.DLIMIT_BOTTOM, difs)
    dift = jnp.where(botm, c.DLIMIT_BOTTOM, dift)
    ghat = jnp.where(li == nz, 0.0, ghat)

    # ---- ocnint: backward-Euler solves (ocnint_mod :19-221) --------------
    row = li                               # row lane r = Fortran row r+1
    dto_f = dto
    f_cor = cs(CS_F) if f_row is None else f_row
    hm_sfc = zs(hm, 0, 1)
    # U / V with semi-implicit Coriolis (:44-72)
    cu_m, cc_m, cl_m = _tridcof(difm, tdn, tup, nz, row, za)
    rhs_u = uo + dto_f * f_cor * 0.5 * (vo + v)
    rhs_u = rhs_u + jnp.where(row == 0, -dto_f * wu0x / hm_sfc, 0.0)
    difm_nz = zs(difm, nz, nz + 1)
    tdn_nz = zs(tdn, nz, nz + 1)
    rhs_u = rhs_u + jnp.where(row == nz - 1,
                              tdn_nz * difm_nz * zs(uo, nz, nz + 1), 0.0)
    u_sol = _pcr_solve(cu_m, cc_m, cl_m, rhs_u, nz, row, za)
    rhs_v = vo - dto_f * f_cor * 0.5 * (uo + u_sol)
    rhs_v = rhs_v + jnp.where(row == 0, -dto_f * wu0y / hm_sfc, 0.0)
    rhs_v = rhs_v + jnp.where(row == nz - 1,
                              tdn_nz * difm_nz * zs(vo, nz, nz + 1), 0.0)
    v_sol = _pcr_solve(cu_m, cc_m, cl_m, rhs_v, nz, row, za)

    # temperature (:82-162)
    kmixe = kbl
    cu_t, cc_t, cl_t = _tridcof(dift, tdn, tup, nz, row, za)
    rhs_t = _tridrhs(hm, to, wxnt_t, dift, ghat, wx0t, wx0t, dto_f, tdn,
                     nz, row, za)
    fcorr = cs(CS_FCORRP)
    if flags.l_relax_sst and not flags.l_fcorr_withz and not flags.l_fcorr:
        relax_sst = cs(CS_RELAX_SST)
        sst0 = cs(CS_SST0)
        do_rlx = relax_sst > 1.0e-10
        dm_kmixe = ext(dm, kmixe, li)
        to_sfc = zs(to, 0, 1)
        incr = dto_f * relax_sst * (sst0 - to_sfc) * dm_kmixe / hm_sfc
        if not flags.l_relax_calconly:
            rhs_t = rhs_t + jnp.where((row == 0) & do_rlx, incr, 0.0)
        fcorr = jnp.where(do_rlx,
                          relax_sst * (sst0 - to_sfc) * dm_kmixe
                          * rho0 * cp0, 0.0)
    if flags.l_fcorr and not flags.l_relax_sst and not flags.l_fcorr_withz:
        rhs_t = rhs_t + jnp.where(
            row == 0, dto_f * cs(CS_FCORR2D) / (rho0 * cp0 * hm_sfc), 0.0)
    tinc = jnp.zeros_like(u)
    if flags.l_fcorr_withz and not flags.l_fcorr:
        tinc = tinc + dto_f * fcorr_z / (rho * cp)
    if flags.l_relax_ocnt:
        tinc = tinc + dto_f * cs(CS_RELAX_OCNT) * (ocnt_clim - to)
    rhs_t = rhs_t + jnp.where(li <= nz - 1, tinc, 0.0)
    ocntcorr = tinc * rho * cp / dto_f
    t_sol = _pcr_solve(cu_t, cc_t, cl_t, rhs_t, nz, row, za)

    # salinity (:164-219); wXNT(:,2) is identically zero in the reference
    cu_s, cc_s, cl_s = _tridcof(difs, tdn, tup, nz, row, za)
    rhs_s = _tridrhs(hm, so, jnp.zeros_like(u), difs, ghat, wx0s, wx0s,
                     dto_f, tdn, nz, row, za)
    if flags.l_advect:
        # steady advection corrections, salinity scalar only (rhsmod modes
        # 1-7, solvers.F90:176-335; ocnint applies them only to n=2,
        # mckpp_physics_ocnint_mod.F90:179-184).  km is this pass's kmixe
        # (ocnstep_mod.F90:133-153 passes the vmix output of the SAME
        # pass).  Each mode's level "basis" (mask / band thickness) is a
        # lane-masked profile; per-column magnitudes arrive pre-grouped by
        # mode in colscal rows CS_ADV1..7.
        rows_nz = row < nz
        km = kbl
        dm_km = ext(dm, km, li)
        hm_km = ext(hm, km - 1, li)
        hm_km1 = ext(hm, km - 2, li)
        # static inclusive prefix sum over rows of hm(r+1) — the depth
        # accumulator of the mode-6/7 band walks (solvers.F90:292-331)
        hm_next = jnp.where(rows_nz, shl(hm, 1), 0.0)
        pfx = hm_next
        stp = 1
        while stp < wz:
            pfx = pfx + shr(pfx, stp)
            stp *= 2
        bigr = jnp.asarray(wz + 100, jnp.int32)

        def band_basis(in_walk, depth, target):
            hit = in_walk & rows_nz & (depth >= target)
            fx = jnp.min(jnp.where(hit, li, bigr), axis=za, keepdims=True)
            n2r = jnp.where(fx < bigr, fx, nz - 1)
            m = in_walk & rows_nz & (li <= n2r)
            delta = jnp.sum(jnp.where(m, hm, 0.0), axis=za, keepdims=True)
            return jnp.where(m, 1.0 / jnp.where(delta > 0.0, delta, 1.0),
                             0.0)

        total = jnp.zeros_like(rhs_s)
        for mode in range(1, 8):
            coef = cs(CS_ADV1 + mode - 1)
            if mode == 1:                 # upper layer only
                basis = jnp.where(row == 0, 1.0 / adv_st["hm1"], 0.0)
            elif mode == 2:               # mixed layer 1..km-1
                m2 = rows_nz & (li <= km - 2)
                d2 = jnp.sum(jnp.where(m2, hm, 0.0), axis=za, keepdims=True)
                basis = jnp.where(
                    m2, 1.0 / jnp.where(d2 > 0.0, d2, 1.0), 0.0)
            elif mode == 3:               # whole column
                basis = jnp.where(rows_nz, adv_st["inv_delta3"], 0.0)
            elif mode == 4:               # below 100 m to nz-1 (static band)
                if adv_st["n1_4"] <= 0 or adv_st["delta4"] <= 0.0:
                    continue
                m4 = (row >= adv_st["n1_4"] - 1) & (row <= nz - 2)
                basis = jnp.where(m4, 1.0 / adv_st["delta4"], 0.0)
            elif mode == 5:               # bottom-layer diffusion
                basis = jnp.where(row == nz - 1, 1.0 / adv_st["hm_nz"], 0.0)
            elif mode == 6:               # seasonal mixed layer
                depth6 = adv_st["hm1"] + pfx
                dmax6 = dm_km - 0.5 * (hm_km + hm_km1)
                basis = band_basis(rows_nz, depth6, dmax6)
            else:                         # mode 7: seasonal thermocline
                # km (=kbl) is always >= 2 here (the bldepth crossing
                # search starts at lane 2), so clamp explicitly: at
                # km==2 the walk starts at the surface row with
                # pfx_lo=0 (previously emergent from the no-match
                # gather returning 0).  km<=2 is ill-defined in the
                # reference as well — solvers.F90:318-331 would index
                # hm(0)/rhs(0).
                km7 = jnp.maximum(km, 2)
                in7 = li >= km7 - 2
                pfx_lo = jnp.where(km7 >= 3, ext(pfx, km7 - 3, li), 0.0)
                depth7 = (dm_km - 0.5 * hm_km) + (pfx - pfx_lo)
                basis = band_basis(in7, depth7, 100.0)
            total = total + coef * basis
        rhs_s = rhs_s + (dto_f * 0.033) * total
    sinc = jnp.zeros_like(u)
    if flags.l_sfcorr_withz:
        sinc = sinc + dto_f * sfcorr_z
    if flags.l_relax_sal:
        sinc = sinc + dto_f * cs(CS_RELAX_SAL) * (sal_clim - so)
    rhs_s = rhs_s + jnp.where(li <= nz - 1, sinc, 0.0)
    scorr = sinc / dto_f
    s_sol = _pcr_solve(cu_s, cc_s, cl_s, rhs_s, nz, row, za)

    # compose solutions: level nz held at the old value (tridmat :134-159)
    def compose(sol, old):
        return jnp.where(li < nz, sol, jnp.where(li == nz, old, 0.0))

    u_n = compose(u_sol, uo)
    v_n = compose(v_sol, vo)
    t_n = compose(t_sol, to)
    s_n = compose(s_sol, so)
    hbl_b = hbl
    kbl_f = kbl.astype(dtype)

    if not full:
        # colout slots: 0=hmix, 1=kmix, 2=surface rho, 3=surface cp
        # (2-3 let the diagnostics-lazy step keep ntflux's rho0/cp0 exact
        # without the materialization pass — forcing.py:69-75)
        zcol = jnp.zeros_like(hbl_b)
        colout = jnp.concatenate(
            [hbl_b, kbl_f, rho0, cp0] + [zcol] * 4, axis=za)
        return (u_n, v_n, t_n, s_n, u, v, t, s, colout)

    uref_b = zs(uref, nz - 1, nz)
    vref_b = zs(vref, nz - 1, nz)
    zcol = jnp.zeros_like(hbl_b)
    colout = jnp.concatenate(
        [hbl_b, kbl_f, rhoh2o, fcorr, wu0x, wu0y, wx0t, wx0s, wx0b,
         uref_b, vref_b, ustar] + [zcol] * 4, axis=za)
    return (u_n, v_n, t_n, s_n, colout, difm, difs, dift, ghat, rho, cp,
            alpha, beta, buoy, rig, dbloc, shsq, wxnt_t, swdk_opt,
            tinc, sinc, ocntcorr, scorr)


def _step_body(u0, v0, t0, s0, uo, vo, to, so, swdk_c, swfrac_c,
               ocnt_clim, sal_clim, fcorr_z, sfcorr_z, colscal,
               zm, hm, dm, tdn, tup, aref,
               *, nz, flags: PassFlags, dto, zaxis, zbot, adv_st,
               itermax, hmixtolfrac, extra_iters, comp_iter_max,
               rmsd_thr, hm_bot, dm_nz):
    """The ENTIRE ocean step's iteration control fused around the pass
    body: 3 compulsory passes, the per-column-masked hmix-convergence
    while_loop and the instability-trap outer while_loop (reference:
    mckpp_physics_ocnstep_mod.F90:122-236) — all inside one kernel scope,
    so state never round-trips HBM between passes and each BLOCK of
    columns stops iterating as soon as its own columns converge (the
    batch-level loops pay every pass for the whole batch's slowest
    column).  Per-column update masking is identical to the batch-level
    code in ops/ocnstep_fused.py, so results are bitwise-equal.

    ``u0..s0`` are the extrapolated profiles (both the raw and the
    smoothed-iterate initial values).  colscal carries the per-column
    scalars incl. CS_ACTIVE (run_physics), CS_RHO0_IN/CS_CP0_IN (previous
    surface rho/cp for the lazy-diagnostics carry) and CS_F (initial
    Coriolis; the trap's retry multiplies it per column in-kernel).

    Returns (u, v, t, s, ux, vx, tx, sx, colstep) with colstep rows
    0=hmix, 1=kmix, 2=rho0, 3=cp0, 4=comp_flag, 5=reset_flag, 6=f_used,
    7=pad.
    """
    za = zaxis
    wz = u0.shape[za]
    dtype = u0.dtype
    shape_li = (1, wz) if za == 1 else (wz, 1)
    li = jax.lax.broadcasted_iota(jnp.int32, shape_li, za)
    if za == 1:
        cs = lambda k: colscal[:, k:k + 1]
    else:
        cs = lambda k: colscal[k:k + 1, :]
    run = partial(_pass_body, nz=nz, flags=flags, dto=dto, full=False,
                  zaxis=zaxis, zbot=zbot, adv_st=adv_st)

    def pass_(u, v, t, s, ux, vx, tx, sx, f_row):
        # f is threaded as an explicit override (the trap's retry
        # multiplies it per column), NOT by rewriting the colscal row
        return run(u, v, t, s, ux, vx, tx, sx, uo, vo, to, so,
                   swdk_c, swfrac_c, ocnt_clim, sal_clim, fcorr_z,
                   sfcorr_z, colscal, zm, hm, dm, tdn, tup, aref,
                   f_row=f_row)

    def rowk(colout, k):
        return colout[:, k:k + 1] if za == 1 else colout[k:k + 1, :]

    active = cs(CS_ACTIVE) > 0.5

    def integrate(f_local):
        """One full semi-implicit integration attempt (ocnstep:103-192);
        the in-kernel twin of ocnstep_fused.integrate."""
        u, v, t, s = u0, v0, t0, s0
        ux, vx, tx, sx = u0, v0, t0, s0
        for _ in range(3):            # compulsory passes (:122-135)
            u, v, t, s, ux, vx, tx, sx, colout = pass_(
                u, v, t, s, ux, vx, tx, sx, f_local)
        hmixn = rowk(colout, 0)
        kmixn = rowk(colout, 1)
        rho0n = rowk(colout, 2)
        cp0n = rowk(colout, 3)
        if not flags.lkpp:
            return u, v, t, s, ux, vx, tx, sx, hmixn, kmixn, rho0n, cp0n

        # counters and masks travel as floats: Mosaic's scf.while
        # lowering rejects i1 (and is happiest with uniform f32) carries
        def cond(carry):
            return jnp.any(carry[-1] > 0.5)

        def body(carry):
            (u, v, t, s, ux, vx, tx, sx,
             hmixe, kmixe, hmixn, kmixn, rho0, cp0,
             it, iconv, cont_f) = carry
            cont = cont_f > 0.5
            (u_n, v_n, t_n, s_n, ux_n, vx_n, tx_n, sx_n,
             colout) = pass_(u, v, t, s, ux, vx, tx, sx, f_local)
            hmix_p = rowk(colout, 0)
            kmix_p = rowk(colout, 1)
            rho0_p = rowk(colout, 2)
            cp0_p = rowk(colout, 3)
            it_n = it + 1.0
            kidx = kmix_p.astype(jnp.int32)
            tol = hmixtolfrac * jnp.where(
                kidx == nz + 1, hm_bot,
                _ext(hm, jnp.clip(kidx - 1, 0, nz), li, za))
            iconv_n = jnp.where(jnp.abs(hmix_p - hmixe) > tol,
                                0.0, iconv + 1.0)
            cont_n = ((iconv_n < 3.0)
                      & ((it_n < itermax) | (hmix_p > hmixe))
                      & (it_n < itermax + extra_iters) & active)
            hmixe_n = jnp.where(cont_n, hmix_p, hmixe)
            kmixe_n = jnp.where(cont_n, kmix_p, kmixe)

            m = lambda a, b: jnp.where(cont, a, b)

            return (m(u_n, u), m(v_n, v), m(t_n, t), m(s_n, s),
                    m(ux_n, ux), m(vx_n, vx), m(tx_n, tx), m(sx_n, sx),
                    m(hmixe_n, hmixe), m(kmixe_n, kmixe),
                    m(hmix_p, hmixn), m(kmix_p, kmixn),
                    m(rho0_p, rho0), m(cp0_p, cp0),
                    m(it_n, it), m(iconv_n, iconv),
                    (cont & cont_n).astype(dtype))

        it0 = jnp.full(hmixn.shape, 3.0, dtype)
        ic0 = jnp.zeros(hmixn.shape, dtype)
        carry = (u, v, t, s, ux, vx, tx, sx, hmixn, kmixn,
                 hmixn, kmixn, rho0n, cp0n, it0, ic0,
                 active.astype(dtype))
        carry = jax.lax.while_loop(cond, body, carry)
        (u, v, t, s, ux, vx, tx, sx) = carry[:8]
        hmixn, kmixn = carry[10], carry[11]
        rho0n, cp0n = carry[12], carry[13]
        return u, v, t, s, ux, vx, tx, sx, hmixn, kmixn, rho0n, cp0n

    # ---- instability trap (ocnstep:89, :194-236) -------------------------
    w_rms = jnp.where(li <= nz, hm / dm_nz, 0.0)

    def instability(u, v, t, s):
        # all-float formulation (bool/int cross-lane reductions have
        # shown per-lane miscompiles under Mosaic inside while bodies)
        lvl = li < nz                     # levels 1..nz
        dxv = jnp.abs(t - _shl(t, 1, axis=za))
        bad = jnp.where(lvl & ((jnp.abs(u) >= 10.0)
                               | (jnp.abs(v) >= 10.0)
                               | (dxv >= 10.0)), 1.0, 0.0)
        nbad = bad.sum(axis=za, keepdims=True)
        blown = nbad > 0.5

        def rmsd(q, qo):
            return jnp.sqrt((((q - qo) ** 2) * w_rms).sum(
                axis=za, keepdims=True))

        ex = [rmsd(u, uo) >= rmsd_thr[0], rmsd(v, vo) >= rmsd_thr[1],
              rmsd(t, to) >= rmsd_thr[2], rmsd(s, so) >= rmsd_thr[3]]
        exf = sum(jnp.where(e, 1.0, 0.0) for e in ex)
        nexceed = jnp.where(blown, 0.0, exf)
        comp = blown | ex[0] | ex[1] | ex[2] | ex[3]
        fmul = 1.01 ** (nbad + nexceed)
        return comp, fmul

    # comp travels as a 0/1 float in the carry: Mosaic has no select
    # between i1 vectors ("unsupported target bitwidth for truncation")
    def outer_cond(carry):
        comp, reset = carry[8], carry[9]
        return jnp.any((comp > 0.5) & (reset <= float(comp_iter_max))
                       & active)

    def outer_body(carry):
        f_local, reset = carry[10], carry[9]
        pred = ((carry[8] > 0.5) & (reset <= float(comp_iter_max))
                & active)
        res = integrate(f_local)
        u, v, t, s, ux, vx, tx, sx, hmixn, kmixn, rho0, cp0 = res
        comp_n, fmul = instability(u, v, t, s)
        f_n = f_local * jnp.where(comp_n, fmul, 1.0)
        reset_n = reset + 1.0

        m = lambda a, b: jnp.where(pred, a, b)
        o = carry
        # slot 13 records the f the surviving attempt actually used (the
        # reference multiplies f AFTER integration, ocnstep:205,224)
        return (m(u, o[0]), m(v, o[1]), m(t, o[2]), m(s, o[3]),
                m(ux, o[4]), m(vx, o[5]), m(tx, o[6]), m(sx, o[7]),
                m(comp_n.astype(dtype), o[8]), m(reset_n, o[9]),
                m(f_n, o[10]),
                m(hmixn, o[11]), m(kmixn, o[12]), m(f_local, o[13]),
                m(rho0, o[14]), m(cp0, o[15]))

    f0 = cs(CS_F)
    zer = jnp.zeros(f0.shape, dtype)
    carry0 = (u0, v0, t0, s0, u0, v0, t0, s0,
              jnp.ones(f0.shape, dtype), zer, f0, zer,
              jnp.full(f0.shape, float(nz), dtype), f0,
              cs(CS_RHO0_IN), cs(CS_CP0_IN))
    fin = jax.lax.while_loop(outer_cond, outer_body, carry0)
    colstep = jnp.concatenate(
        [fin[11], fin[12], fin[14], fin[15],
         fin[8], fin[9], fin[13], zer], axis=za)
    return (fin[0], fin[1], fin[2], fin[3],
            fin[4], fin[5], fin[6], fin[7], colstep)


# ---------------------------------------------------------------------------
# Wrappers: the same body as a plain XLA function or a Pallas TPU kernel
# ---------------------------------------------------------------------------

N_PROFILE_IN = 12      # u v t s ux vx tx sx uo vo to so
N_IN_TOTAL = 25        # + swdk, swfrac, 4 forcing profiles, colscal, 5 grid rows, aref
N_STEP_IN = 21         # step kernel: u0 v0 t0 s0 uo vo to so + the rest


def n_fast_outputs():
    return 9


def n_full_outputs():
    return 23


def make_fused_pass(grid, ncol: int, dtype, flags: PassFlags, dto: float,
                    *, full: bool, impl: str = "xla", block: int = 128,
                    zaxis: int = 1):
    """Build the fused-pass callable.

    grid: VerticalGrid; returns fn(*arrays) -> tuple of outputs, where the
    25 inputs are (u, v, t, s, ux, vx, tx, sx, uo, vo, to, so, swdk, swfrac,
    ocnt_clim, sal_clim, fcorr_z, sfcorr_z, colscal, zm, hm, dm, tdn, tup,
    aref).

    Layout (static ``zaxis``):
    * zaxis=1: profiles (ncol, WZ), colscal (ncol, NSC), grid rows (1, WZ)
      — z on lanes (wastes 1 - wz/128 of each vector register);
    * zaxis=0: profiles (WZ, ncol), colscal (NSC, ncol), grid rows (WZ, 1),
      aref pre-transposed — columns on lanes (always full 128-lane
      vectors), z on sublanes.  ~2x better VPU utilization at nz=69.

    Forcing profiles may be z-row dummies when their flag is off.

    impl: "xla" (traced body — CPU / float64 parity) | "pallas" (TPU kernel)
    | "interpret" (Pallas interpreter — tests).
    """
    nz = grid.nz
    wz = nz + 2
    adv_st = None
    if flags.l_advect:
        # static grid scalars for the rhsmod bases (solvers.F90:195-331)
        hm_np = np.asarray(grid.hm, np.float64)
        zm_np = np.asarray(grid.zm, np.float64)
        below = zm_np[:nz] < -100.0
        n1_4 = int(np.argmax(below)) + 1 if below.any() else 0
        m4 = np.zeros(nz, bool)
        if n1_4 > 0:
            m4[n1_4 - 1:nz - 1] = True
        adv_st = dict(
            hm1=float(hm_np[0]),
            inv_delta3=float(1.0 / hm_np[:nz].sum()),
            n1_4=n1_4,
            delta4=float(hm_np[:nz][m4].sum()),
            hm_nz=float(hm_np[nz - 1]))
    body = partial(_pass_body, nz=nz, flags=flags, dto=dto, full=full,
                   zaxis=zaxis, zbot=float(np.asarray(grid.zm)[nz]),
                   adv_st=adv_st)
    if impl == "xla":
        return body

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # clamp the column tile to a divisor of ncol (small batches, parity
    # probes); measured on v5e: 256 beats 128 by ~3%, 512 neutral, 1024
    # overflows VMEM (see config.py pass_block)
    requested_block = block
    while block > 8 and ncol % block != 0:
        block //= 2
    if ncol % block != 0:
        raise ValueError(f"ncol={ncol} must be a multiple of block={block}")
    if block != requested_block:
        from ..utils.logging import mckpp_print
        mckpp_print("FUSED_PASS", f"pass_block {requested_block} does not "
                    f"divide ncol={ncol}; clamped to {block}")
    n_out = n_full_outputs() if full else n_fast_outputs()
    colout_pos = 4 if full else 8
    colout_w = 16 if full else 8

    def kernel(*refs):
        ins = [r[:] for r in refs[:N_IN_TOTAL]]
        outs = refs[N_IN_TOTAL:]
        res = body(*ins)
        for o_ref, val in zip(outs, res):
            o_ref[:] = val

    if zaxis == 1:
        def col_spec(a):
            # (ncol, K) arrays blocked over columns; (1, K) broadcasts
            if a.shape[0] == 1:
                return pl.BlockSpec((1, a.shape[1]), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((block, a.shape[1]), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        def out_sd(k):
            w = colout_w if k == colout_pos else wz
            return (jax.ShapeDtypeStruct((ncol, w), dtype),
                    pl.BlockSpec((block, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    else:
        def col_spec(a):
            # (K, ncol) arrays blocked over columns; (K, 1) broadcasts
            if a.shape[1] == 1:
                return pl.BlockSpec((a.shape[0], 1), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((a.shape[0], block), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        def out_sd(k):
            w = colout_w if k == colout_pos else wz
            return (jax.ShapeDtypeStruct((w, ncol), dtype),
                    pl.BlockSpec((w, block), lambda i: (0, i),
                                 memory_space=pltpu.VMEM))

    def call(*arrays):
        assert len(arrays) == N_IN_TOTAL, len(arrays)
        in_specs = []
        for a in arrays[:-1]:
            in_specs.append(col_spec(a))
        aref = arrays[-1]
        in_specs.append(pl.BlockSpec(aref.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        out_shapes = []
        out_specs = []
        for k in range(n_out):
            sd, spec = out_sd(k)
            out_shapes.append(sd)
            out_specs.append(spec)
        return pl.pallas_call(
            kernel,
            grid=(ncol // block,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=(impl == "interpret"),
        )(*arrays)

    return call

def make_fused_step(grid, ncol: int, dtype, flags: PassFlags, dto: float,
                    *, itermax: int, hmixtolfrac: float, extra_iters: int,
                    impl: str = "xla", block: int = 128, zaxis: int = 1):
    """Build the whole-step kernel callable (see :func:`_step_body`).

    fn(*arrays) -> (u, v, t, s, ux, vx, tx, sx, colstep); the 21 inputs
    are (u0, v0, t0, s0, uo, vo, to, so, swdk, swfrac, ocnt_clim,
    sal_clim, fcorr_z, sfcorr_z, colscal, zm, hm, dm, tdn, tup, aref) in
    the same layouts as :func:`make_fused_pass`.

    impl: "xla" (traced body — CPU / f64 parity; the while loops then run
    batch-global, which is update-masking-identical) | "pallas" (TPU
    kernel: loops run per column BLOCK, so converged blocks stop early) |
    "interpret".
    """
    from . import fused_pass as _self  # noqa: F401  (symmetry with pass)
    nz = grid.nz
    wz = nz + 2
    adv_st = None
    if flags.l_advect:
        hm_np = np.asarray(grid.hm, np.float64)
        zm_np = np.asarray(grid.zm, np.float64)
        below = zm_np[:nz] < -100.0
        n1_4 = int(np.argmax(below)) + 1 if below.any() else 0
        m4 = np.zeros(nz, bool)
        if n1_4 > 0:
            m4[n1_4 - 1:nz - 1] = True
        adv_st = dict(
            hm1=float(hm_np[0]),
            inv_delta3=float(1.0 / hm_np[:nz].sum()),
            n1_4=n1_4,
            delta4=float(hm_np[:nz][m4].sum()),
            hm_nz=float(hm_np[nz - 1]))
    hm_np_ = np.asarray(grid.hm, np.float64)
    body = partial(
        _step_body, nz=nz, flags=flags, dto=dto, zaxis=zaxis,
        zbot=float(np.asarray(grid.zm)[nz]), adv_st=adv_st,
        itermax=itermax, hmixtolfrac=hmixtolfrac,
        extra_iters=extra_iters, comp_iter_max=int(c.COMP_ITER_MAX),
        rmsd_thr=tuple(float(x) for x in c.RMSD_THRESHOLD),
        hm_bot=float(hm_np_[nz - 1]),
        dm_nz=float(np.asarray(grid.dm)[nz]))
    if impl == "xla":
        return body

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    requested_block = block
    while block > 8 and ncol % block != 0:
        block //= 2
    if ncol % block != 0:
        raise ValueError(f"ncol={ncol} must be a multiple of block={block}")
    if block != requested_block:
        from ..utils.logging import mckpp_print
        mckpp_print("FUSED_STEP", f"pass_block {requested_block} does not "
                    f"divide ncol={ncol}; clamped to {block}")
    n_out = 9
    colout_pos = 8
    colout_w = 8

    def kernel(*refs):
        ins = [r[:] for r in refs[:N_STEP_IN]]
        outs = refs[N_STEP_IN:]
        res = body(*ins)
        for o_ref, val in zip(outs, res):
            o_ref[:] = val

    if zaxis == 1:
        def col_spec(a):
            if a.shape[0] == 1:
                return pl.BlockSpec((1, a.shape[1]), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((block, a.shape[1]), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        def out_sd(k):
            w = colout_w if k == colout_pos else wz
            return (jax.ShapeDtypeStruct((ncol, w), dtype),
                    pl.BlockSpec((block, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    else:
        def col_spec(a):
            if a.shape[1] == 1:
                return pl.BlockSpec((a.shape[0], 1), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((a.shape[0], block), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        def out_sd(k):
            w = colout_w if k == colout_pos else wz
            return (jax.ShapeDtypeStruct((w, ncol), dtype),
                    pl.BlockSpec((w, block), lambda i: (0, i),
                                 memory_space=pltpu.VMEM))

    def call(*arrays):
        assert len(arrays) == N_STEP_IN, len(arrays)
        in_specs = [col_spec(a) for a in arrays[:-1]]
        aref = arrays[-1]
        in_specs.append(pl.BlockSpec(aref.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        out_shapes = []
        out_specs = []
        for k in range(n_out):
            sd, spec = out_sd(k)
            out_shapes.append(sd)
            out_specs.append(spec)
        return pl.pallas_call(
            kernel,
            grid=(ncol // block,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=(impl == "interpret"),
        )(*arrays)

    return call
