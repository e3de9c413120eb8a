"""Turbulent velocity scales wm/ws: lookup-table build + bilinear lookup.

Reimplements the reference's precomputed (zehat, ustar) tables
(mckpp_physics_lookup_mod.F90:11-66) and the bilinear interpolation with
analytic stable-branch fallback (mckpp_physics_verticalmixing_wscale_mod.F90).

The tables are (ni+2, nj+2) = (892, 50) device-resident arrays, built once at
model construction; keeping the table (rather than the fused analytic
formula) preserves bit-level behavior of the reference's interpolation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants as c

_DELTAZ = (c.WS_ZMAX - c.WS_ZMIN) / (c.WS_NI + 1)
_DELTAU = (c.WS_UMAX - c.WS_UMIN) / (c.WS_NJ + 1)


def build_tables(dtype=np.float64):
    """Build (wmt, wst) lookup tables of shape (892, 50).

    Entry (i, j): zehat = zmin + i*deltaz, ustar = umin + j*deltau.
    Stable (zehat >= 0): wm = ws = vonk*ustar/(1 + 5*zeta).
    Unstable: quartic/half-power branches above zetam/zetas, cube-root
    similarity below (reference: mckpp_physics_lookup_mod.F90:42-64).
    """
    ni, nj = c.WS_NI, c.WS_NJ
    zehat = c.WS_ZMIN + _DELTAZ * np.arange(ni + 2, dtype=dtype)[:, None]
    usta = c.WS_UMIN + _DELTAU * np.arange(nj + 2, dtype=dtype)[None, :]
    epsln = 1.0e-20
    zeta = zehat / (usta ** 3 + epsln)

    wm_stable = c.VONK * usta / (1.0 + c.C1_WS * zeta)
    # np.cbrt handles the (discarded) negative-argument entries of the
    # deep-unstable branches without warnings; where selected, the
    # arguments are provably positive (zeta <= zetam/zetas).
    wm_unst = np.where(
        zeta > c.ZETAM,
        c.VONK * usta * np.abs(1.0 - c.C2_WS * zeta) ** 0.25,
        c.VONK * np.cbrt(c.AM * usta ** 3 - c.CM * zehat),
    )
    ws_unst = np.where(
        zeta > c.ZETAS,
        c.VONK * usta * np.abs(1.0 - c.C3_WS * zeta) ** 0.5,
        c.VONK * np.cbrt(c.AS_WS * usta ** 3 - c.CS * zehat),
    )
    stable = zehat >= 0.0
    wmt = np.where(stable, wm_stable, wm_unst)
    wst = np.where(stable, wm_stable, ws_unst)
    return jnp.asarray(wmt), jnp.asarray(wst)


def wscale(sigma, hbl, ustar, bfsfc, wmt, wst):
    """Bilinear lookup of (wm, ws) at (zehat, ustar); analytic formula for
    zehat > zmax (reference: mckpp_physics_verticalmixing_wscale_mod.F90:57-95).

    All scalar inputs (vmapped over columns/levels by callers).
    """
    zehat = jnp.asarray(c.VONK * sigma * hbl * bfsfc)
    ustar = jnp.asarray(ustar)

    zdiff = zehat - c.WS_ZMIN
    iz = jnp.clip((zdiff / _DELTAZ).astype(jnp.int32), 0, c.WS_NI)
    udiff = ustar - c.WS_UMIN
    ju = jnp.clip((udiff / _DELTAU).astype(jnp.int32), 0, c.WS_NJ)
    zfrac = zdiff / _DELTAZ - iz.astype(zdiff.dtype)
    ufrac = udiff / _DELTAU - ju.astype(udiff.dtype)
    fzfrac = 1.0 - zfrac

    wam = fzfrac * wmt[iz, ju + 1] + zfrac * wmt[iz + 1, ju + 1]
    wbm = fzfrac * wmt[iz, ju] + zfrac * wmt[iz + 1, ju]
    wm_tab = (1.0 - ufrac) * wbm + ufrac * wam
    was = fzfrac * wst[iz, ju + 1] + zfrac * wst[iz + 1, ju + 1]
    wbs = fzfrac * wst[iz, ju] + zfrac * wst[iz + 1, ju]
    ws_tab = (1.0 - ufrac) * wbs + ufrac * was

    ucube = ustar ** 3
    wm_ana = c.VONK * ustar * ucube / (ucube + c.C1_WS * zehat)
    use_table = zehat <= c.WS_ZMAX
    wm = jnp.where(use_table, wm_tab, wm_ana)
    ws = jnp.where(use_table, ws_tab, wm_ana)
    return wm, ws
