"""Oceanic planetary boundary-layer depth.

Reimplements mckpp_physics_verticalmixing_bldepth_mod.F90:32-203: hbl is the
shallowest depth where the bulk Richardson number reaches Ricr=0.30 (linear
interpolation between levels), limited under stable forcing by the
Monin-Obukhov and Ekman depths and by the ocean depth.

The reference's kl=2..km loop carries the previous level's Rib and
Monin-Obukhov depth and freezes all updates after the first crossing; here
the per-level quantities (bfsfc, velocity scales, Vt^2) are precomputed
vectorized (values past the crossing are unused) and a lax.scan reproduces
the Rib/dmo recurrences and the first-crossing capture exactly.

Index conventions: ``dvsq``/``ritop`` are 0-based level arrays
(python k == Fortran k+1); ``dbloc`` is Fortran-aligned (nz+1,);
``swfrac_cached`` is the 0-based per-level cached shortwave fraction
(reference swfrac_opt with fact = hbf = 1.0).  Returned ``kbl`` is the
*Fortran* level index (2..nz) of the first grid level below hbl, kept
1-based so downstream interface indexing matches the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as c
from .swfrac import swfrac
from .wscale import wscale

_EPSLN = 1.0e-16


def bldepth(dvsq, ritop, dbloc, ustar, bo, bosol, swfrac_cached, jerlov,
            f, ocdepth, l_initflag, zm, hm, wmt, wst, *, vonk=c.VONK):
    """Diagnose (hbl, bfsfc, stable, caseA, kbl) for one column."""
    nz = zm.shape[0] - 1
    dtype = zm.dtype

    vtc = c.CV * jnp.sqrt(0.2 / c.CS / c.EPSILON_KPP) / vonk ** 2 / c.RICR
    hek = c.CEKMAN * ustar / (jnp.abs(f) + _EPSLN)
    zbot = zm[nz]                       # zm(kmp1) Fortran = -dmax

    # ---- vectorized per-level quantities for Fortran kl = 2..km ----------
    kl = jnp.arange(2, nz + 1)          # Fortran indices
    z_kl = zm[kl - 1]                   # zm(kl)
    z_klm1 = zm[kl - 2]                 # zm(kl-1)
    bfsfc_l = bo + bosol * (1.0 - swfrac_cached[kl - 1])
    stable_l = jnp.where(bfsfc_l + _EPSLN >= 0.0, 1.0, 0.0)
    sigma_l = stable_l + (1.0 - stable_l) * c.EPSILON_KPP
    from functools import partial as _partial
    _ws = _partial(wscale, vonk=vonk)
    _, ws_l = jax.vmap(_ws, in_axes=(0, 0, None, 0, None, None))(
        sigma_l, -z_kl, ustar, bfsfc_l, wmt, wst)
    dz_up = z_klm1 - z_kl               # zm(kl-1)-zm(kl)
    dz_dn = z_kl - zm[kl]               # zm(kl)-zm(kl+1)
    bvsq = 0.5 * (dbloc[kl - 1] / dz_up + dbloc[kl] / dz_dn)
    vtsq = -z_kl * ws_l * jnp.sqrt(jnp.abs(bvsq)) * vtc
    # Monin-Obukhov depth candidate at each level
    dmo_raw = c.CMONOB * ustar ** 3 / vonk / (jnp.abs(bfsfc_l) + _EPSLN)
    dmo_l = stable_l * dmo_raw - (1.0 - stable_l) * zbot
    hekman_l = stable_l * hek - (1.0 - stable_l) * zbot
    rib_num = ritop[kl - 1]
    rib_den = dvsq[kl - 1] + vtsq + _EPSLN

    # ---- Rib recurrence as a max-plus associative scan -------------------
    # The reference's sequential Rib(ku) = max(Ritop/(dVsq+Vt^2+eps),
    # Rib(ka) + eps) (:136-137) is the composition of maps
    # f_k(x) = max(raw_k, x + eps), which is associative under
    # (m, c) -> f(x) = max(m, x + c); a log-depth scan replaces the 68-step
    # sequential loop (pure scan overhead on TPU).
    raw = rib_num / rib_den

    def comb(a, b):
        m_a, c_a = a
        m_b, c_b = b
        return jnp.maximum(m_b, m_a + c_b), c_a + c_b

    eps_vec = jnp.full_like(raw, _EPSLN)
    m_acc, c_acc = jax.lax.associative_scan(comb, (raw, eps_vec))
    rib = jnp.maximum(m_acc, c_acc)              # f_1..k(0)
    rib_prev = jnp.concatenate([jnp.zeros(1, dtype), rib[:-1]])
    dmo_prev = jnp.concatenate([jnp.full((1,), -zbot, dtype), dmo_l[:-1]])

    # ---- vectorized per-level hbl candidates + first crossing ------------
    hri = -z_klm1 + (z_klm1 - z_kl) * (c.RICR - rib_prev) / (rib - rib_prev)
    slope = (dmo_l - dmo_prev) / (z_klm1 - z_kl)
    hmonob = jnp.where(dmo_l <= -z_kl,
                       (dmo_l + slope * z_kl) / (1.0 - slope),
                       -zbot)
    hmin = jnp.minimum(jnp.minimum(hri, hmonob),
                       jnp.minimum(hekman_l, -ocdepth))
    # SJW/NPK fix: skip the Ekman/MO limits when they would put hbl above
    # the previous level (only outside initialization)
    # (reference: mckpp_physics_verticalmixing_bldepth_mod.F90:161-184)
    hmin2 = jnp.minimum(jnp.minimum(hri, hmonob), -ocdepth)
    use_fix = (~l_initflag) & (hmin < -z_klm1) & (hmin2 < -z_kl)
    hmin = jnp.where(use_fix, hmin2, hmin)
    crossing = hmin < -z_kl
    found = crossing.any()
    first = jnp.argmax(crossing)
    hbl = jnp.where(found, hmin[first], -zm[nz - 1])
    kbl = jnp.where(found, kl[first].astype(jnp.int32),
                    jnp.asarray(nz, jnp.int32))

    # ---- final surface forcing at hbl ------------------------------------
    swdk_hbl = swfrac(-1.0, hbl, jerlov)
    bfsfc = bo + bosol * (1.0 - swdk_hbl)
    stable = jnp.where(bfsfc >= 0.0, 1.0, 0.0)
    bfsfc = bfsfc + stable * _EPSLN
    case_a = jnp.where(-zm[kbl - 1] - 0.5 * hm[kbl - 1] - hbl >= 0.0, 1.0, 0.0)
    return hbl, bfsfc, stable, case_a, kbl
