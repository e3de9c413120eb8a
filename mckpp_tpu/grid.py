"""Vertical & horizontal grid construction.

Index conventions used throughout this framework (see each physics op's
docstring for per-array mapping to the reference):

* **Level arrays** (cell centres) are 0-based, length ``nzp1``:
  python ``k`` == Fortran ``k+1``.  ``zm[k] < 0`` is the level depth,
  ``hm[k]`` the layer thickness, with ``hm[nz] = 1e-10`` and
  ``zm[nz] = -dmax`` for the fictitious bottom layer
  (reference: mckpp_initialize_geography_mod.F90:72-74).
* **Interface arrays** are Fortran-aligned, index ``j`` == Fortran ``j``:
  ``j = 0`` is the surface, interface ``j`` sits below level ``j-1``
  (python) for ``j >= 1``.  ``dm[j]`` is interface depth (``dm[0] = 0``).

The tridiagonal coefficient factors mirror
mckpp_initialize_ocean.F90:34-43:
``tri_dn[k] = dto/hm(k)/dzb(k)`` and ``tri_up[k] = dto/hm(k)/dzb(k-1)``
(Fortran indices), with ``tri_dn[0] = dto/hm(1)`` kept for the surface-flux
RHS factor.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as c


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VerticalGrid:
    zm: jax.Array       # (nzp1,) level depths, negative
    hm: jax.Array       # (nzp1,) layer thicknesses
    dm: jax.Array       # (nz+1,) interface depths, positive; dm[0]=0
    tri_dn: jax.Array   # (nz+1,) dto/hm(k)/dzb(k);  tri_dn[0] = dto/hm(1)
    tri_up: jax.Array   # (nz+1,) dto/hm(k)/dzb(k-1); [0:2] unused (=0)

    @property
    def nz(self) -> int:
        return self.zm.shape[0] - 1

    @property
    def nzp1(self) -> int:
        return self.zm.shape[0]

    @property
    def dmax(self) -> jax.Array:
        return -self.zm[-1]


def _tri_factors(zm: np.ndarray, hm: np.ndarray, dto: float):
    nz = zm.shape[0] - 1
    dzb = np.zeros(nz + 1, dtype=zm.dtype)           # dzb[j] = zm(j) - zm(j+1), Fortran j=1..nz
    dzb[1:] = zm[:-1] - zm[1:]
    tri_dn = np.zeros(nz + 1, dtype=zm.dtype)
    tri_up = np.zeros(nz + 1, dtype=zm.dtype)
    tri_dn[0] = dto / hm[0]
    tri_dn[1:] = dto / hm[:nz] / dzb[1:]
    tri_up[2:] = dto / hm[1:nz] / dzb[1:nz]
    return tri_dn, tri_up


def make_vertical_grid(nz: int, dmax: float, dto: float, *,
                       stretch: bool = False, dscale: float = 0.0,
                       dtype=jnp.float64) -> VerticalGrid:
    """Uniform or exponentially-stretched vertical grid
    (reference: mckpp_initialize_geography_mod.F90:43-74)."""
    npdtype = np.dtype(jnp.dtype(dtype).name)
    hm = np.zeros(nz + 1, dtype=npdtype)
    if stretch:
        if dscale == 0.0:
            raise ValueError("dscale must be nonzero for stretched grids")
        dfac = 1.0 - np.exp(-dscale)
        i = np.arange(1, nz + 1, dtype=npdtype)
        sk = -(i - 0.5) / nz
        h = dmax * dfac / nz / dscale / (1.0 + sk * dfac)
        hm[:nz] = h * dmax / h.sum()
    else:
        hm[:nz] = dmax / nz
    zm = np.zeros(nz + 1, dtype=npdtype)
    dm = np.zeros(nz + 1, dtype=npdtype)
    hsum = 0.0
    for k in range(nz):
        zm[k] = -(hsum + 0.5 * hm[k])
        hsum += hm[k]
        dm[k + 1] = hsum
    hm[nz] = 1.0e-10
    zm[nz] = -dmax
    tri_dn, tri_up = _tri_factors(zm, hm, dto)
    return VerticalGrid(zm=jnp.asarray(zm), hm=jnp.asarray(hm), dm=jnp.asarray(dm),
                        tri_dn=jnp.asarray(tri_dn), tri_up=jnp.asarray(tri_up))


def vertical_grid_from_arrays(z: np.ndarray, h: np.ndarray, d: np.ndarray,
                              dto: float, dtype=jnp.float64) -> VerticalGrid:
    """Vertical grid from file-supplied d, h, z over levels 1..nz
    (reference: mckpp_initialize_geography_mod.F90:25-41, 72-74).

    ``d`` are interface depths after each layer (Fortran dm(1:nz));
    dmax is derived as ``-(z[nz-1] - h[nz-1])``.
    """
    npdtype = np.dtype(jnp.dtype(dtype).name)
    nz = len(z)
    zm = np.zeros(nz + 1, dtype=npdtype)
    hm = np.zeros(nz + 1, dtype=npdtype)
    dm = np.zeros(nz + 1, dtype=npdtype)
    zm[:nz] = z
    hm[:nz] = h
    dm[1:] = d
    dmax = -1.0 * (z[nz - 1] - h[nz - 1])
    hm[nz] = 1.0e-10
    zm[nz] = -dmax
    tri_dn, tri_up = _tri_factors(zm, hm, dto)
    return VerticalGrid(zm=jnp.asarray(zm), hm=jnp.asarray(hm), dm=jnp.asarray(dm),
                        tri_dn=jnp.asarray(tri_dn), tri_up=jnp.asarray(tri_up))


def coriolis(dlat: jax.Array, twopi: float = c.TWOPI) -> jax.Array:
    """Coriolis parameter with a floor at 2.5 degrees latitude
    (reference: mckpp_initialize_geography_mod.F90:78-88).  ``twopi`` is
    NAME_CONSTANTS-overridable (the reference computes f from its namelist
    twopi, mckpp_initialize_namelist_mod.F90:94)."""
    omega2 = 2.0 * (twopi / c.SIDEREAL_DAY)
    floor = omega2 * jnp.sin(2.5 * twopi / 360.0) * jnp.sign(dlat)
    full = omega2 * jnp.sin(dlat * twopi / 360.0)
    # sign(0) = 0 in jax but the reference's SIGN(1., 0.0) = +1
    floor = jnp.where(dlat == 0.0, omega2 * jnp.sin(2.5 * twopi / 360.0), floor)
    return jnp.where(jnp.abs(dlat) < 2.5, floor, full)


def regular_lonlat(nx: int, ny: int, alon: float, alat: float,
                   dlon: float, dlat: float, dtype=jnp.float64):
    """Regular lon/lat grid flattened to (npts,) row-major in y
    (matching the reference's ipt = (j-1)*nx + i layout)."""
    lons = alon + dlon * np.arange(nx)
    lats = alat + dlat * np.arange(ny)
    lon2, lat2 = np.meshgrid(lons, lats)        # (ny, nx)
    return (jnp.asarray(lon2.reshape(-1), dtype=dtype),
            jnp.asarray(lat2.reshape(-1), dtype=dtype))
