"""Boundary-layer diffusivities (shape-function matching) + interface
enhancement.

Reimplements mckpp_physics_verticalmixing_blmix_mod.F90:13-151 and
mckpp_physics_verticalmixing_enhance_mod.F90:10-51.

Interface arrays (difm/difs/dift) are Fortran-aligned (nz+2,); ``kbl`` is
the Fortran level index from bldepth.  Returns ``blmc`` as a Fortran-aligned
(nz+1, 3) array (index 1..nz; [:,0]=momentum, 1=scalar, 2=temperature),
``ghat`` (nz+1,), and ``dkm1`` (3,).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as c
from .wscale import wscale

_EPSLN = 1.0e-20


def _shape_coeffs(sig, gat1, dat1):
    a1 = sig - 2.0
    a2 = 3.0 - 2.0 * sig
    a3 = sig - 1.0
    return a1 + a2 * gat1 + a3 * dat1


def blmix(difm, difs, dift, ustar, bfsfc, hbl, stable, case_a, kbl,
          zm, hm, wmt, wst, *, vonk=c.VONK):
    """Compute boundary-layer mixing coefficients for one column."""
    nz = zm.shape[0] - 1
    dtype = zm.dtype
    cg = c.CSTAR * vonk * (c.CS * vonk * c.EPSILON_KPP) ** (1.0 / 3.0)

    # velocity scales at hbl
    sigma = stable * 1.0 + (1.0 - stable) * c.EPSILON_KPP
    wm, ws = wscale(sigma, hbl, ustar, bfsfc, wmt, wst, vonk=vonk)

    # interior diffusivity and derivative at hbl, from level kn
    # kn = kbl-1 in case A, kbl in case B (Fortran level index)
    kn = jnp.where(case_a + _EPSLN >= 1.0, kbl - 1, kbl)
    hm_kn = hm[kn - 1]
    hm_knp1 = hm[kn]                      # hm(kn+1) Fortran
    delhat = 0.5 * hm_kn - zm[kn - 1] - hbl
    r = 1.0 - delhat / hm_kn

    def match(dif):
        dvdzup = (dif[kn - 1] - dif[kn]) / hm_kn
        dvdzdn = (dif[kn] - dif[kn + 1]) / hm_knp1
        dp = 0.5 * ((1.0 - r) * (dvdzup + jnp.abs(dvdzup))
                    + r * (dvdzdn + jnp.abs(dvdzdn)))
        dh = dif[kn] + dp * delhat
        return dp, dh

    viscp, visch = match(difm)
    difsp, difsh = match(difs)
    diftp, difth = match(dift)

    f1 = stable * c.C1_WS * bfsfc / (ustar ** 4 + _EPSLN)
    gat1 = jnp.stack([visch / hbl / (wm + _EPSLN),
                      difsh / hbl / (ws + _EPSLN),
                      difth / hbl / (ws + _EPSLN)])
    dat1 = jnp.stack([jnp.minimum(-viscp / (wm + _EPSLN) + f1 * visch, 0.0),
                      jnp.minimum(-difsp / (ws + _EPSLN) + f1 * difsh, 0.0),
                      jnp.minimum(-diftp / (ws + _EPSLN) + f1 * difth, 0.0)])

    # interface loop ki=1..km, vectorized
    ki = jnp.arange(1, nz + 1)
    sig = (-zm[ki - 1] + 0.5 * hm[ki - 1]) / hbl
    sigma_i = stable * sig + (1.0 - stable) * jnp.minimum(sig, c.EPSILON_KPP)
    from functools import partial as _partial
    wm_i, ws_i = jax.vmap(_partial(wscale, vonk=vonk),
                          in_axes=(0, None, None, None, None, None))(
        sigma_i, hbl, ustar, bfsfc, wmt, wst)
    gm = _shape_coeffs(sig, gat1[0], dat1[0])
    gs = _shape_coeffs(sig, gat1[1], dat1[1])
    gt = _shape_coeffs(sig, gat1[2], dat1[2])
    blmc = jnp.zeros((nz + 1, 3), dtype=dtype)
    blmc = blmc.at[1:, 0].set(hbl * wm_i * sig * (1.0 + sig * gm))
    blmc = blmc.at[1:, 1].set(hbl * ws_i * sig * (1.0 + sig * gs))
    blmc = blmc.at[1:, 2].set(hbl * ws_i * sig * (1.0 + sig * gt))
    ghat = jnp.zeros(nz + 1, dtype=dtype)
    ghat = ghat.at[1:].set((1.0 - stable) * cg / (ws_i * hbl + _EPSLN))

    # diffusivities at the kbl-1 grid level
    sig_k = -zm[kbl - 2] / hbl
    sigma_k = stable * sig_k + (1.0 - stable) * jnp.minimum(sig_k, c.EPSILON_KPP)
    wm_k, ws_k = wscale(sigma_k, hbl, ustar, bfsfc, wmt, wst, vonk=vonk)
    gm_k = _shape_coeffs(sig_k, gat1[0], dat1[0])
    gs_k = _shape_coeffs(sig_k, gat1[1], dat1[1])
    gt_k = _shape_coeffs(sig_k, gat1[2], dat1[2])
    dkm1 = jnp.stack([hbl * wm_k * sig_k * (1.0 + sig_k * gm_k),
                      hbl * ws_k * sig_k * (1.0 + sig_k * gs_k),
                      hbl * ws_k * sig_k * (1.0 + sig_k * gt_k)])
    return blmc, ghat, dkm1


def enhance(difm, difs, dift, dkm1, hbl, kbl, case_a, blmc, ghat, zm):
    """Quadratic enhancement of blmc at interface kbl-1
    (reference: mckpp_physics_verticalmixing_enhance_mod.F90:31-49)."""
    nz = zm.shape[0] - 1
    ki = kbl - 1                                  # Fortran interface index
    delta = (hbl + zm[ki - 1]) / (zm[ki - 1] - zm[ki])

    def enh(dif, col):
        dkmp5 = case_a * dif[ki] + (1.0 - case_a) * blmc[ki, col]
        dstar = (1.0 - delta) ** 2 * dkm1[col] + delta ** 2 * dkmp5
        return (1.0 - delta) * dif[ki] + delta * dstar

    # only interfaces 1..km-1 are candidates (reference loop bound)
    apply = (ki >= 1) & (ki <= nz - 1)
    idx = jnp.arange(blmc.shape[0])
    sel = apply & (idx == ki)
    blmc = blmc.at[:, 0].set(jnp.where(sel, enh(difm, 0), blmc[:, 0]))
    blmc = blmc.at[:, 1].set(jnp.where(sel, enh(difs, 1), blmc[:, 1]))
    blmc = blmc.at[:, 2].set(jnp.where(sel, enh(dift, 2), blmc[:, 2]))
    ghat = jnp.where(sel, (1.0 - case_a) * ghat, ghat)
    return blmc, ghat
