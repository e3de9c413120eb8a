"""Surface-flux computation & packing (the reference's mckpp_fluxes layer).

Reimplements mckpp_fluxes_mod.F90:35-118: every ``ndtocn`` steps the raw
fluxes (taux, tauy, swf, lwf, lhf, shf, rain, snow) — read from the forcing
file or the constant test values — are packed per wet column into the sflux
vector, and the non-turbulent (penetrating solar) flux profile is refreshed
from the currently stored rho/cp.

sflux packing (Fortran sflux(ipt,1:6,5,0) -> python (ncol, 6)):
0=taux (floored at 1e-10 if calm), 1=tauy, 2=swf,
3=lwf+lhf+shf-snow*FLSN, 4=ice melt (1e-10), 5=rain+snow+lhf/EL.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import constants as c
from .config import KppConfig
from .state import State, ColumnParams, Forcing
from .ops.swfrac import swdk


class RawFluxes(NamedTuple):
    taux: jax.Array
    tauy: jax.Array
    swf: jax.Array
    lwf: jax.Array
    lhf: jax.Array
    shf: jax.Array
    rain: jax.Array
    snow: jax.Array


def constant_test_fluxes(ncol: int, dtype=jnp.float64) -> RawFluxes:
    """The l_fluxdata=.FALSE. constant test forcing
    (reference: mckpp_fluxes_mod.F90:41-49)."""
    full = lambda v: jnp.full((ncol,), v, dtype=dtype)
    return RawFluxes(taux=full(0.01), tauy=full(0.0), swf=full(200.0),
                     lwf=full(0.0), lhf=full(-150.0), shf=full(0.0),
                     rain=full(6e-5), snow=full(0.0))


def pack_sflux(raw: RawFluxes, l_ocean, sflux_prev, l_rest: bool,
               flsn: float = c.FLSN, el: float = c.EL):
    """Pack raw fluxes into the sflux vector for wet columns
    (reference: mckpp_fluxes_mod.F90:56-85).  ``flsn``/``el`` (latent
    heats) are NAME_CONSTANTS-overridable."""
    calm = (raw.taux == 0.0) & (raw.tauy == 0.0)
    taux = jnp.where(calm, 1e-10, raw.taux)
    if not l_rest:
        packed = jnp.stack([
            taux, raw.tauy, raw.swf,
            raw.lwf + raw.lhf + raw.shf - raw.snow * flsn,
            jnp.full_like(taux, 1e-10),
            raw.rain + raw.snow + raw.lhf / el,
        ], axis=-1)
    else:
        z = jnp.zeros_like(taux)
        packed = jnp.stack([jnp.full_like(taux, 1e-10), z,
                            jnp.full_like(taux, 300.0),
                            jnp.full_like(taux, -300.0), z, z], axis=-1)
    return jnp.where(l_ocean[:, None], packed, sflux_prev)


def ntflux(st: State, frc: Forcing, prm: ColumnParams, dm, first_step) -> State:
    """Refresh the non-turbulent solar flux profile from current rho/cp
    (reference: mckpp_fluxes_ntflux, mckpp_fluxes_mod.F90:93-118).
    Batched over columns; only wet columns are updated."""
    # cast: the Jerlov decay constants are float64, which under
    # jax_enable_x64 would silently promote an f32 model's swdk cache
    swdk_new = jax.vmap(lambda j: swdk(-dm, j))(prm.jerlov) \
        .astype(st.swdk_opt.dtype)
    swdk_opt = jnp.where(first_step, swdk_new, st.swdk_opt)
    wxnt0 = (-frc.sflux[:, 2:3] * swdk_opt
             / (st.rho[:, 0:1] * st.cp[:, 0:1]))
    wet = prm.l_ocean[:, None]
    wxnt = st.wxnt.at[:, :, 0].set(jnp.where(wet, wxnt0, st.wxnt[:, :, 0]))
    swdk_opt = jnp.where(wet, swdk_opt, st.swdk_opt)
    return dataclasses.replace(st, wxnt=wxnt, swdk_opt=swdk_opt)


def update_fluxes(cfg: KppConfig, st: State, prm: ColumnParams,
                  frc: Forcing, raw: RawFluxes, first_step, dm):
    """The per-ndtocn flux update: pack sflux + refresh wXNT."""
    sflux = pack_sflux(raw, prm.l_ocean, frc.sflux, cfg.forcing.l_rest,
                       flsn=cfg.constants.flsn, el=cfg.constants.el)
    frc = dataclasses.replace(frc, sflux=sflux)
    st = ntflux(st, frc, prm, dm, first_step)
    return st, frc
