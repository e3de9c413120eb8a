"""Diagnostics-lazy stepping (with_diags=False): the prognostic
trajectory must be BITWISE identical to the always-materializing step —
including across flux updates, whose ntflux consumes the surface rho/cp
the lazy step refreshes from the loop carry (forcing.py:69-75)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from mckpp_tpu import KppConfig, DomainConfig, TimeConfig, KppModel
from mckpp_tpu import forcing as forcing_mod
from mckpp_tpu.grid import coriolis
from mckpp_tpu.state import init_params
from mckpp_tpu.io import diagnostics as diag

PROGNOSTIC = ("u", "x", "us", "xs", "hmixd", "old", "new", "hmix", "kmix",
              "ssurf", "tref", "uref", "vref", "reset_flag",
              "dampu_flag", "dampv_flag")


def _build(ncol=8, nz=12):
    cfg = KppConfig(
        domain=DomainConfig(nx=ncol, ny=1, nz=nz, dmax=150.0),
        time=TimeConfig(dtsec=3600.0, ndtocn=3, startt=0.0, finalt=1.0),
        dtype="float64")
    cfg = dataclasses.replace(
        cfg, physics=dataclasses.replace(cfg.physics,
                                         pass_impl="fused_xla"))
    model = KppModel(cfg)
    nzp1 = nz + 1
    zm = np.asarray(model.grid.zm)
    t0 = np.tile(19.0 + 7.0 * np.exp(zm / 50.0), (ncol, 1))
    s0 = np.tile(35.2 - 0.4 * np.exp(zm / 90.0), (ncol, 1))
    u0 = np.zeros((ncol, nzp1, 2))
    prm = init_params(ncol, nzp1, dtype=model.dtype)
    lat = jnp.linspace(-20.0, 40.0, ncol, dtype=model.dtype)
    prm = dataclasses.replace(prm, f=coriolis(lat), dlat=lat)
    st, prm, frc = model.initial_state(u0, t0, s0, prm)
    return model, cfg, st, prm, frc


def _run(model, cfg, st, prm, frc, steps, lazy_steps):
    """Run `steps` steps with flux updates on the ndtocn cadence; steps
    in `lazy_steps` use with_diags=False."""
    for nt in range(1, steps + 1):
        if (nt - 1) % cfg.time.ndtocn == 0:
            raw = forcing_mod.constant_test_fluxes(st.u.shape[0], model.dtype)
            st, frc = forcing_mod.update_fluxes(
                cfg, st, prm, frc, raw, jnp.asarray(nt <= 1), model.grid.dm)
        st = model.step(st, prm, frc, first_step=(nt <= 1),
                        with_diags=(nt not in lazy_steps))
    return st


def test_lazy_prognostic_trajectory_bitwise():
    model, cfg, st, prm, frc = _build()
    # lazy on steps 2,3,5,6 (incl. step 3, right before the nt=4 flux
    # update — exercises the stale-rho hazard), full on 1,4,7
    st_a = _run(model, cfg, st, prm, frc, 7, lazy_steps={2, 3, 5, 6})
    st_b = _run(model, cfg, st, prm, frc, 7, lazy_steps=set())
    for name in PROGNOSTIC:
        a, b = np.asarray(getattr(st_a, name)), np.asarray(getattr(st_b, name))
        np.testing.assert_array_equal(a, b, err_msg=name)
    # both runs end on a FULL step, so diagnostics agree there too
    for name in ("difm", "dift", "rho", "cp", "wu", "wx", "tinc_fcorr"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_a, name)), np.asarray(getattr(st_b, name)),
            err_msg=name)


def test_lazy_surface_rho_cp_fresh():
    """After a lazy step, the surface rho/cp rows equal the full step's
    (they feed the next ntflux); deeper rows may be stale."""
    model, cfg, st, prm, frc = _build()
    raw = forcing_mod.constant_test_fluxes(st.u.shape[0], model.dtype)
    st, frc = forcing_mod.update_fluxes(cfg, st, prm, frc, raw,
                                        jnp.asarray(True), model.grid.dm)
    lazy = model.step(st, prm, frc, first_step=True, with_diags=False)
    full = model.step(st, prm, frc, first_step=True, with_diags=True)
    np.testing.assert_array_equal(np.asarray(lazy.rho[:, 0]),
                                  np.asarray(full.rho[:, 0]))
    np.testing.assert_array_equal(np.asarray(lazy.cp[:, 0]),
                                  np.asarray(full.cp[:, 0]))


def test_needs_full_schedule():
    """The reference iodef shape — T/S/hmix reduced every step, wide
    fields 3h-instant — needs the materialization pass only on the
    all-diags emit steps."""
    streams = [
        diag.Stream("inst_1h", "instant", 3, fields=("T", "S", "hmix")),
        diag.Stream("mean_3h", "average", 9, fields=("T", "S", "hmix")),
        diag.Stream("all_3h", "instant", 9),     # all 35 fields
    ]
    dm = diag.DiagnosticsManager(streams, nx=1, ny=1, zm=np.zeros(3))
    schedule = [dm.needs_full(nt) for nt in range(1, 19)]
    assert schedule == [nt % 9 == 0 for nt in range(1, 19)]

    # a mean over a wide field forces materialization every step
    dm2 = diag.DiagnosticsManager(
        [diag.Stream("m", "average", 9, fields=("difm",))],
        nx=1, ny=1, zm=np.zeros(3))
    assert all(dm2.needs_full(nt) for nt in range(1, 10))
