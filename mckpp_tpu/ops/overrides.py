"""Physics overrides & resilience semantics: reset-to-climatology,
freezing floor, isothermal-column detection, bottom-temperature pinning.

Reimplements mckpp_physics_overrides.F90 as masked batch ops.  These traps
are model *features* (SURVEY.md section 5): each emits per-column flags
(freeze_flag, reset_flag) that are first-class diagnostics.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..config import KppConfig
from ..state import State, ColumnParams, Forcing


def check_profile(st: State, prm: ColumnParams, frc: Forcing, comp_flag,
                  grid, cfg: KppConfig) -> State:
    """Per-column repair after ocnstep
    (reference: mckpp_physics_overrides.F90:42-125).

    Static structure: whether T/S climatologies exist decides the reset
    target (reference checks ocnT_file/sal_file != 'none').
    """
    f = cfg.forcing
    have_clim = f.ocnt_file not in ("", "none") and f.sal_file not in ("", "none")
    nzp1 = grid.nzp1
    dtype = grid.zm.dtype
    x, u, reset_flag = st.x, st.u, st.reset_flag

    # reset failed columns (comp_flag) to climatology / initial currents
    if have_clim:
        x = jnp.where(comp_flag,
                      jnp.stack([frc.ocnt_clim, frc.sal_clim], axis=-1), x)
    u = jnp.where(comp_flag, prm.u_init, u)
    reset_flag = jnp.where(comp_flag, jnp.asarray(999.0, dtype), reset_flag)

    # freezing floor at -1.8 C (reference :85-94)
    freeze_flag = st.freeze_flag
    tinc = st.tinc_fcorr
    if f.l_no_freeze:
        frozen = prm.l_ocean & (x[:, 0] < -1.8)
        tinc = tinc + jnp.where(frozen, -1.8 - x[:, 0], 0.0)
        freeze_flag = freeze_flag + frozen.sum().astype(dtype) / float(nzp1)
        x = x.at[:, 0].set(jnp.where(frozen, -1.8, x[:, 0]))

    # isothermal-column detection (reference :102-123)
    if f.l_no_isotherm:
        zm = grid.zm
        j = jnp.arange(1, nzp1)                   # Fortran levels 2..nzp1
        in_range = j + 1 <= f.isotherm_bottom     # Fortran j <= iso_bot
        dz = zm[1:] - zm[:-1]
        dtdz = jnp.where(in_range, jnp.abs(x[1:, 0] - x[:-1, 0]) * dz, 0.0).sum()
        dz_total = jnp.where(in_range, dz, 0.0).sum()
        iso = prm.l_ocean & (jnp.abs(dtdz / dz_total) < f.isotherm_threshold)
        x = jnp.where(iso, jnp.stack([frc.ocnt_clim, frc.sal_clim], axis=-1), x)
        reset_flag = jnp.where(iso, -reset_flag, reset_flag)
        # the reference's ELSE zeroes reset_flag for non-ocean columns too
        reset_flag = jnp.where(prm.l_ocean, reset_flag, jnp.zeros((), dtype))
    else:
        # reference zeroes reset_flag whenever the isotherm check is off
        # (mckpp_physics_overrides.F90:121-123)
        reset_flag = jnp.zeros((), dtype)

    return dataclasses.replace(st, x=x, u=u, reset_flag=reset_flag,
                               freeze_flag=freeze_flag, tinc_fcorr=tinc)


def bottomtemp(st: State, frc: Forcing, grid, dto) -> State:
    """Pin the bottom-level temperature to the prescribed value, logging the
    increment as a heat correction (reference :12-24).  Batched over columns
    (leading axes broadcast)."""
    nz = grid.nz
    tinc_bot = frc.bottom_temp - st.x[..., nz, 0]
    tinc = st.tinc_fcorr.at[..., nz].set(tinc_bot)
    ocntcorr = st.ocntcorr.at[..., nz].set(
        tinc_bot * st.rho[..., nz] * st.cp[..., nz] / dto)
    x = st.x.at[..., nz, 0].set(frc.bottom_temp)
    return dataclasses.replace(st, x=x, tinc_fcorr=tinc, ocntcorr=ocntcorr)
