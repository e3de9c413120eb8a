"""Backward-Euler implicit integration of the column (ocnint).

Reimplements mckpp_physics_ocnint_mod.F90:19-221: the U/V solves with
semi-implicit Coriolis cross-coupling, then the T solve with ghat nonlocal
and penetrating-solar RHS plus SST relaxation / flux corrections / 3-D
relaxation increments, then the S solve with salt corrections and advection
RHS modifications.  All per-column; static feature flags specialize the
trace.

Reference-index notes: ``wu0``/``wx0`` are the kinematic surface fluxes
(Fortran wU(0,:), wX(0,:)); ``kmixe`` is the Fortran mixed-layer level
index used to pick dm(kmixe).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .tridiag import tridcof, tridmat, tridmat_pcr, tridrhs, rhsmod


class OcnintResult(NamedTuple):
    u: jnp.ndarray           # (nzp1, 2)
    x: jnp.ndarray           # (nzp1, 2)
    tinc_fcorr: jnp.ndarray  # (nzp1,)
    sinc_fcorr: jnp.ndarray  # (nzp1,)
    ocntcorr: jnp.ndarray    # (nzp1,)
    scorr: jnp.ndarray       # (nzp1,)
    fcorr: jnp.ndarray       # () surface heat correction diagnostic


def ocnint(u, x, uo, xo, f, kmixe,
           difm, difs, dift, ghat, wxnt, wu0, wx0, rho, cp,
           sst0, fcorr_twod, fcorr_withz, sfcorr_withz, ocnt_clim, sal_clim,
           relax_sst, relax_ocnt, relax_sal, fcorr_prev,
           nmodeadv, modeadv, advection,
           grid, dto, *, l_relax_sst=False, l_relax_calconly=False,
           l_fcorr=False, l_fcorr_withz=False, l_sfcorr_withz=False,
           l_relax_sal=False, l_relax_ocnt=False, l_advect=False,
           solver="pcr"):
    tridsolve = tridmat_pcr if solver == "pcr" else tridmat
    zm, hm, dm = grid.zm, grid.hm, grid.dm
    tri_dn, tri_up = grid.tri_dn, grid.tri_up
    nz = zm.shape[0] - 1
    dtype = zm.dtype
    i = jnp.arange(1, nz + 1)           # Fortran rows

    # ---- U and V (reference :44-72) --------------------------------------
    cu_m, cc_m, cl_m = tridcof(difm, tri_dn, tri_up, nz)
    rhs_u = uo[:nz, 0] + dto * f * 0.5 * (uo[:nz, 1] + u[:nz, 1])
    rhs_u = rhs_u.at[0].add(-dto * wu0[0] / hm[0])
    rhs_u = rhs_u.at[nz - 1].add(tri_dn[nz] * difm[nz] * uo[nz, 0])
    u_new0 = tridsolve(cu_m, cc_m, cl_m, rhs_u, uo[:, 0])
    # V uses the *updated* U in its Coriolis term (sequential in the reference)
    rhs_v = uo[:nz, 1] - dto * f * 0.5 * (uo[:nz, 0] + u_new0[:nz])
    rhs_v = rhs_v.at[0].add(-dto * wu0[1] / hm[0])
    rhs_v = rhs_v.at[nz - 1].add(tri_dn[nz] * difm[nz] * uo[nz, 1])
    u_new1 = tridsolve(cu_m, cc_m, cl_m, rhs_v, uo[:, 1])
    u_new = jnp.stack([u_new0, u_new1], axis=1)

    # ---- Temperature (reference :82-162) ---------------------------------
    ghatflux = wx0[0]
    sturflux = wx0[0]
    cu_t, cc_t, cl_t = tridcof(dift, tri_dn, tri_up, nz)
    rhs_t = tridrhs(hm, xo[:, 0], wxnt[:, 0], dift, ghat, sturflux,
                    ghatflux, dto, tri_dn, nz)

    fcorr = fcorr_prev
    if l_relax_sst and not l_fcorr_withz and not l_fcorr:
        do_rlx = relax_sst > 1.0e-10
        incr = dto * relax_sst * (sst0 - xo[0, 0]) * dm[kmixe] / hm[0]
        if not l_relax_calconly:
            rhs_t = rhs_t.at[0].add(jnp.where(do_rlx, incr, 0.0))
        fcorr = jnp.where(do_rlx,
                          relax_sst * (sst0 - xo[0, 0]) * dm[kmixe] * rho[0] * cp[0],
                          0.0)
    if l_fcorr and not l_relax_sst and not l_fcorr_withz:
        rhs_t = rhs_t.at[0].add(dto * fcorr_twod / (rho[0] * cp[0] * hm[0]))

    tinc = jnp.zeros(nz + 1, dtype=dtype)
    if l_fcorr_withz and not l_fcorr:
        tinc = tinc + dto * fcorr_withz / (rho * cp)
    if l_relax_ocnt:
        tinc = tinc + dto * relax_ocnt * (ocnt_clim - xo[:, 0])
    rhs_t = rhs_t + tinc[:nz]
    ocntcorr = tinc * rho * cp / dto
    x_new0 = tridsolve(cu_t, cc_t, cl_t, rhs_t, xo[:, 0])

    # ---- Salinity (reference :164-219) -----------------------------------
    cu_s, cc_s, cl_s = tridcof(difs, tri_dn, tri_up, nz)
    rhs_s = tridrhs(hm, xo[:, 1], wxnt[:, 1], difs, ghat, wx0[1],
                    wx0[1], dto, tri_dn, nz)
    if l_advect:
        # up to maxmodeadv steady advection corrections for scalar 2
        maxmodeadv = modeadv.shape[0]
        for im in range(maxmodeadv):
            active = im < nmodeadv[1]
            mode = jnp.where(active, modeadv[im, 1], 0)
            rhs_s = rhsmod(2, mode, advection[im, 1], dto, kmixe, dm[kmixe],
                           rhs_s, rho, cp, hm, zm, nz)
    sinc = jnp.zeros(nz + 1, dtype=dtype)
    if l_sfcorr_withz:
        sinc = sinc + dto * sfcorr_withz
    if l_relax_sal:
        sinc = sinc + dto * relax_sal * (sal_clim - xo[:, 1])
    rhs_s = rhs_s + sinc[:nz]
    scorr = sinc / dto
    x_new1 = tridsolve(cu_s, cc_s, cl_s, rhs_s, xo[:, 1])
    x_new = jnp.stack([x_new0, x_new1], axis=1)

    return OcnintResult(u=u_new, x=x_new, tinc_fcorr=tinc, sinc_fcorr=sinc,
                        ocntcorr=ocntcorr, scorr=scorr, fcorr=fcorr)
