"""State containers: pytrees of batched column arrays.

Replaces the reference's ``kpp_3d_type`` / ``kpp_1d_type`` dichotomy
(mckpp_data_fields.F90:8-184) with a single set of pytrees; ``jax.vmap`` *is*
the 3D<->1D transfer layer (mckpp_types_transfer.F90 has no equivalent).

Array index conventions (see also grid.py):

* level arrays are 0-based ``(..., nzp1)``, python ``k`` == Fortran ``k+1``;
* interface arrays are Fortran-aligned: ``difm/difs/dift`` have length
  ``nz+2`` (Fortran ``0:nzp1``), ``ghat/dbloc/shsq/rig`` length ``nz+1``
  with index 0 unused/zero, ``wu/wx/wxnt/swdk_opt`` length ``nz+1``
  (Fortran ``0:nz``).

The two-level time history (``us``, ``xs``, ``hmixd`` with integer phase
``old``/``new``) is kept explicitly — required for exact restart parity
(reference: mckpp_physics_ocnstep_mod.F90:343-353, mckpp_xios_io.F90:364-433).

Fields are split by mutability:

* :class:`State` — everything the physics updates per step (the fields the
  reference scatters back in mckpp_fields_1dto3d, mckpp_types_transfer.F90:199-327).
* :class:`ColumnParams` — per-column quantities physics never updates
  (marked "Not updated within physics" in mckpp_types_transfer.F90).
* :class:`Forcing` — surface fluxes + boundary/climatology fields refreshed
  on their own cadences by the forcing/ancillary subsystem.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _dc(cls):
    return jax.tree_util.register_dataclass(dataclasses.dataclass(frozen=True)(cls))


@_dc
class State:
    # prognostics: u[(ncol,) nzp1, 2] velocities; x[..., 0]=T (degC),
    # x[..., 1]=S - Sref (psu)
    u: jax.Array
    x: jax.Array
    # two-level time history + phase
    us: jax.Array          # (..., nzp1, 2, 2)
    xs: jax.Array          # (..., nzp1, 2, 2)
    hmixd: jax.Array       # (..., 2)
    old: jax.Array         # (...,) int32
    new: jax.Array         # (...,) int32
    # mixed layer
    hmix: jax.Array        # (...,)
    kmix: jax.Array        # (...,) int32 (Fortran level index of first level below hbl)
    # diagnostics / work fields persisted across steps
    rho: jax.Array         # (..., nzp1) level densities (index 0 doubles as sfc)
    cp: jax.Array          # (..., nzp1)
    buoy: jax.Array        # (..., nzp1)
    talpha: jax.Array      # (..., nzp1)
    sbeta: jax.Array       # (..., nzp1)
    rhoh2o: jax.Array      # (...,) fresh-water density in surface layer
    difm: jax.Array        # (..., nz+2) interface viscosity, Fortran-aligned
    difs: jax.Array        # (..., nz+2)
    dift: jax.Array        # (..., nz+2)
    ghat: jax.Array        # (..., nz+1) nonlocal transport, index 1..nz
    rig: jax.Array         # (..., nz+1) gradient Richardson number
    dbloc: jax.Array       # (..., nz+1)
    shsq: jax.Array        # (..., nz+1)
    wu: jax.Array          # (..., nz+1, 2) momentum flux profiles
    wx: jax.Array          # (..., nz+1, 3) scalar + buoyancy flux profiles
    wxnt: jax.Array        # (..., nz+1, 2) non-turbulent (solar) flux
    swfrac: jax.Array      # (..., nzp1) cached sw fraction at levels
    swdk_opt: jax.Array    # (..., nz+1) cached sw decay at interfaces
    # correction/relaxation increments (diagnosed every step)
    tinc_fcorr: jax.Array  # (..., nzp1)
    sinc_fcorr: jax.Array  # (..., nzp1)
    ocntcorr: jax.Array    # (..., nzp1)
    scorr: jax.Array       # (..., nzp1)
    fcorr: jax.Array       # (...,) surface heat-flux correction diagnostic
    # reference/surface values
    tref: jax.Array        # (...,)
    uref: jax.Array
    vref: jax.Array
    ssurf: jax.Array
    # resilience flags (output as diagnostics every step)
    freeze_flag: jax.Array
    reset_flag: jax.Array
    dampu_flag: jax.Array
    dampv_flag: jax.Array


@_dc
class ColumnParams:
    """Per-column constants (not updated by physics)."""
    f: jax.Array           # (...,) Coriolis
    ocdepth: jax.Array     # (...,) (negative) ocean depth
    jerlov: jax.Array      # (...,) int32, 0-based water type 0..4
    l_ocean: jax.Array     # (...,) bool
    run_physics: jax.Array # (...,) bool
    dlat: jax.Array
    dlon: jax.Array
    sref: jax.Array        # reference salinity (psu)
    ssref: jax.Array
    u_init: jax.Array      # (..., nzp1, 2) initial currents for resets
    relax_sst: jax.Array   # (...,) relaxation rates (1/s)
    relax_sal: jax.Array
    relax_ocnt: jax.Array
    cplwght: jax.Array
    # advection corrections (reference: mckpp_initialize_advection_mod.F90)
    nmodeadv: jax.Array    # (..., 2) int32
    modeadv: jax.Array     # (..., maxmodeadv, 2) int32
    advection: jax.Array   # (..., maxmodeadv, 2)


@_dc
class Forcing:
    """Surface fluxes + boundary fields, refreshed on their cadences.

    ``sflux`` packs the reference's sflux(ipt,1:6,5,0)
    (mckpp_fluxes_mod.F90:59-78): 0=taux, 1=tauy, 2=swf, 3=non-solar
    (lwf+lhf+shf-snow*FLSN), 4=ice melt, 5=freshwater (rain+snow+lhf/EL).
    """
    sflux: jax.Array         # (..., 6)
    sst0: jax.Array          # (...,) SST relaxation target
    fcorr_twod: jax.Array    # (...,) 2-D heat correction (W/m^2)
    sfcorr_twod: jax.Array   # (...,)
    fcorr_withz: jax.Array   # (..., nzp1) 3-D heat correction (W/m^3)
    sfcorr_withz: jax.Array  # (..., nzp1)
    sal_clim: jax.Array      # (..., nzp1) salinity climatology (Sref removed)
    ocnt_clim: jax.Array     # (..., nzp1) temperature climatology
    bottom_temp: jax.Array   # (...,)
    # sea-ice / surface-current climatologies (reference:
    # mckpp_read_ice_mod.F90:57-118; zeroed by the SST read when their
    # climatologies are off, mckpp_read_sst_mod.F90:88-96)
    iceconc: jax.Array       # (...,) sea-ice concentration
    icedepth: jax.Array      # (...,) (only read if l_clim_ice_depth)
    snowdepth: jax.Array     # (...,) (only read if l_clim_snow_on_ice)
    usf: jax.Array           # (...,) climatological surface currents
    vsf: jax.Array


def init_state(ncol: int, nzp1: int, dtype=jnp.float64) -> State:
    nz = nzp1 - 1
    zf = lambda *s: jnp.zeros(s, dtype=dtype)
    zi = lambda *s: jnp.zeros(s, dtype=jnp.int32)
    return State(
        u=zf(ncol, nzp1, 2), x=zf(ncol, nzp1, 2),
        us=zf(ncol, nzp1, 2, 2), xs=zf(ncol, nzp1, 2, 2),
        hmixd=zf(ncol, 2), old=zi(ncol), new=jnp.ones((ncol,), jnp.int32),
        hmix=zf(ncol), kmix=zi(ncol),
        rho=zf(ncol, nzp1), cp=zf(ncol, nzp1), buoy=zf(ncol, nzp1),
        talpha=zf(ncol, nzp1), sbeta=zf(ncol, nzp1), rhoh2o=zf(ncol),
        difm=zf(ncol, nz + 2), difs=zf(ncol, nz + 2), dift=zf(ncol, nz + 2),
        ghat=zf(ncol, nz + 1), rig=zf(ncol, nz + 1),
        dbloc=zf(ncol, nz + 1), shsq=zf(ncol, nz + 1),
        wu=zf(ncol, nz + 1, 2), wx=zf(ncol, nz + 1, 3), wxnt=zf(ncol, nz + 1, 2),
        swfrac=zf(ncol, nzp1), swdk_opt=zf(ncol, nz + 1),
        tinc_fcorr=zf(ncol, nzp1), sinc_fcorr=zf(ncol, nzp1),
        ocntcorr=zf(ncol, nzp1), scorr=zf(ncol, nzp1), fcorr=zf(ncol),
        tref=zf(ncol), uref=zf(ncol), vref=zf(ncol), ssurf=zf(ncol),
        freeze_flag=zf(ncol), reset_flag=zf(ncol),
        dampu_flag=zf(ncol), dampv_flag=zf(ncol),
    )


def init_forcing(ncol: int, nzp1: int, dtype=jnp.float64) -> Forcing:
    zf = lambda *s: jnp.zeros(s, dtype=dtype)
    sflux = jnp.zeros((ncol, 6), dtype=dtype)
    # reference seeds ice-melt with 1e-20 (mckpp_fluxes_mod.F90:27)
    sflux = sflux.at[:, 4].set(1e-20)
    return Forcing(
        sflux=sflux, sst0=zf(ncol), fcorr_twod=zf(ncol), sfcorr_twod=zf(ncol),
        fcorr_withz=zf(ncol, nzp1), sfcorr_withz=zf(ncol, nzp1),
        sal_clim=zf(ncol, nzp1), ocnt_clim=zf(ncol, nzp1),
        bottom_temp=zf(ncol),
        iceconc=zf(ncol), icedepth=zf(ncol), snowdepth=zf(ncol),
        usf=zf(ncol), vsf=zf(ncol),
    )


def init_params(ncol: int, nzp1: int, maxmodeadv: int = 6,
                dtype=jnp.float64) -> ColumnParams:
    zf = lambda *s: jnp.zeros(s, dtype=dtype)
    zi = lambda *s: jnp.zeros(s, dtype=jnp.int32)
    return ColumnParams(
        f=zf(ncol), ocdepth=jnp.full((ncol,), -10000.0, dtype=dtype),
        jerlov=jnp.full((ncol,), 2, jnp.int32),
        l_ocean=jnp.ones((ncol,), bool), run_physics=jnp.ones((ncol,), bool),
        dlat=zf(ncol), dlon=zf(ncol), sref=zf(ncol), ssref=zf(ncol),
        u_init=zf(ncol, nzp1, 2),
        relax_sst=zf(ncol), relax_sal=zf(ncol), relax_ocnt=zf(ncol),
        cplwght=zf(ncol),
        nmodeadv=zi(ncol, 2), modeadv=zi(ncol, maxmodeadv, 2),
        advection=zf(ncol, maxmodeadv, 2),
    )
