"""Interior mixing: shear instability (local Richardson number) + background
internal waves, with one pass of clipped 1-2-1 vertical smoothing.

Reimplements mckpp_physics_verticalmixing_rimix_mod.F90 and
mckpp_physics_verticalmixing_z121_mod.F90 as vectorized per-column ops.

Interface arrays are Fortran-aligned: index ``j`` (1..nz) is the interface
below python level ``j-1``; index 0 is the surface.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as c

_EPS = 1.0e-16


def z121(v, vlo, vhi):
    """Clipped 1-2-1 smoothing of v[1..km] in a length-(km+2) array.

    Mirrors mckpp_physics_verticalmixing_z121_mod.F90:22-43: weights are 0
    outside [vlo, vhi]; neighbours always use *pre-smoothing* values (the
    reference carries the previous original value in the V(0) register).
    Entries 0 and km+1 are zeroed.
    """
    v = v.at[0].set(0.0).at[-1].set(0.0)
    w = jnp.where((v < vlo) | (v > vhi), 0.0, 1.0)
    w = w.at[0].set(0.0).at[-1].set(0.0)
    num = jnp.zeros_like(v)
    den = jnp.zeros_like(v)
    num = num.at[1:-1].set(w[:-2] * v[:-2] + 2.0 * v[1:-1] + w[2:] * v[2:])
    den = den.at[1:-1].set(w[:-2] + 2.0 + w[2:])
    out = jnp.where(den > 0.0, num / jnp.where(den > 0.0, den, 1.0), 0.0)
    return out.at[0].set(0.0).at[-1].set(0.0)


def rimix(dbloc, shsq, zm):
    """Interior diffusivities from the gradient Richardson number.

    dbloc, shsq: (nz+1,) interface arrays (index 1..nz used);
    zm: (nzp1,) level depths.
    Returns (difm, difs, dift, rig): difm/difs/dift are (nz+2,) interface
    arrays with [0]=0 and [nz+1] unset (filled by the kppmix driver);
    rig is the raw (unsmoothed) Richardson number, (nz+1,).
    """
    nz = zm.shape[0] - 1
    dz = jnp.zeros(nz + 1, dtype=zm.dtype)
    dz = dz.at[1:].set(zm[:-1] - zm[1:])            # zm(ki)-zm(ki+1), Fortran ki
    rig = jnp.zeros(nz + 1, dtype=zm.dtype)
    rig = rig.at[1:].set(dbloc[1:] * dz[1:] / (shsq[1:] + _EPS))

    # one pass of clipped 1-2-1 smoothing (mRi=1) over a 0..nzp1 buffer
    buf = jnp.zeros(nz + 2, dtype=zm.dtype)
    buf = buf.at[1:nz + 1].set(rig[1:])
    smooth = z121(buf, 0.0, c.RIINFTY)[1:nz + 1]

    raw = rig[1:]
    # static-instability (convection) factor from the *unsmoothed* Ri
    rigg = jnp.maximum(raw, c.RICON)
    ratio = jnp.minimum((c.RICON - rigg) / c.RICON, 1.0)
    fcon = (1.0 - ratio * ratio) ** 3
    # shear-instability factor from the smoothed Ri
    rigg = jnp.maximum(smooth, 0.0)
    ratio = jnp.minimum(rigg / c.RIINFTY, 1.0)
    fri = (1.0 - ratio * ratio) ** 3

    difm = jnp.zeros(nz + 2, dtype=zm.dtype)
    difs = jnp.zeros(nz + 2, dtype=zm.dtype)
    difm = difm.at[1:nz + 1].set(c.DIFMIW + fcon * c.DIFMCON + fri * c.DIFM0)
    difs = difs.at[1:nz + 1].set(c.DIFSIW + fcon * c.DIFSCON + fri * c.DIFS0)
    dift = difs
    return difm, difs, dift, rig
