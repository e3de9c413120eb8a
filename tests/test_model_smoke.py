"""End-to-end smoke tests: the minimum single/multi-column forced run
(SURVEY.md section 7 build-plan stage 2: constant test fluxes + regular
grid + uniform vertical grid, init -> step -> profiles)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mckpp_tpu import KppConfig, DomainConfig, TimeConfig, KppModel
from mckpp_tpu.grid import coriolis
from mckpp_tpu.state import init_params


def make_model(ncol=4, nz=30, dmax=300.0, dtsec=1200.0, **kw):
    cfg = KppConfig(
        domain=DomainConfig(nx=ncol, ny=1, nz=nz, dmax=dmax),
        time=TimeConfig(dtsec=dtsec, ndtocn=1, startt=0.0, finalt=1.0),
        **kw)
    return KppModel(cfg)


def make_inputs(model, ncol, lat=15.0):
    nzp1 = model.grid.nzp1
    zm = np.asarray(model.grid.zm)
    # stably stratified initial profile, warm surface
    t0 = 20.0 + 5.0 * np.exp(zm / 50.0)         # degC
    s0 = 35.0 - 0.5 * np.exp(zm / 100.0)        # psu
    u0 = np.zeros((ncol, nzp1, 2))
    t0 = np.tile(t0, (ncol, 1))
    s0 = np.tile(s0, (ncol, 1))
    prm = init_params(ncol, nzp1)
    prm = dataclasses.replace(
        prm,
        f=coriolis(jnp.full((ncol,), lat)),
        dlat=jnp.full((ncol,), lat),
        ocdepth=jnp.full((ncol,), -10000.0))
    return u0, t0, s0, prm


def test_init_seeds_history_and_hmix():
    model = make_model(ncol=3)
    u0, t0, s0, prm = make_inputs(model, 3)
    st, prm, frc = model.initial_state(u0, t0, s0, prm)
    assert np.all(np.isfinite(np.asarray(st.hmix)))
    assert np.all(np.asarray(st.hmix) > 0.0)
    # history seeded with the initial profiles in both slots
    np.testing.assert_allclose(np.asarray(st.us[..., 0]), np.asarray(st.u))
    np.testing.assert_allclose(np.asarray(st.xs[..., 1]), np.asarray(st.x))
    np.testing.assert_allclose(np.asarray(st.hmixd[:, 0]), np.asarray(st.hmix))
    assert np.all(np.asarray(st.old) == 0)
    assert np.all(np.asarray(st.new) == 1)
    # Sref removal: x[...,1] is S - Sref
    sref = (s0[:, 0] + s0[:, -1]) / 2
    np.testing.assert_allclose(np.asarray(prm.sref), sref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st.x[:, :, 1]) + sref[:, None],
                               s0, rtol=1e-12)
    # EOS diagnostics populated
    assert np.all(np.asarray(st.rho) > 1000.0)
    assert np.all(np.asarray(st.cp) > 3500.0)


def test_steps_run_finite_and_stable():
    model = make_model(ncol=2)
    u0, t0, s0, prm = make_inputs(model, 2)
    st, prm, frc = model.initial_state(u0, t0, s0, prm)
    st, frc = model.run(st, prm, frc, num_steps=6)
    for name in ("u", "x", "hmix", "difm", "wx"):
        arr = np.asarray(getattr(st, name))
        assert np.all(np.isfinite(arr)), f"non-finite {name}"
    # temperatures stay physical
    t = np.asarray(st.x[..., 0])
    assert t.min() > -2.0 and t.max() < 40.0
    # wind stress spins up a surface current
    assert np.abs(np.asarray(st.u[:, 0, 0])).max() > 1e-4
    # history phase ping-pongs: starting (old,new)=(0,1), each step sets
    # old=new, new=1-old -> after an even number of steps back to (0,1)
    assert np.all(np.asarray(st.old) == 0)
    assert np.all(np.asarray(st.new) == 1)
    # no instability resets in this benign setup
    assert np.all(np.asarray(st.reset_flag) == 0.0)


def test_surface_heating_warms_surface_layer():
    # net surface heat: -150 (nonsolar) + 200*absorbed solar > 0 near surface
    model = make_model(ncol=1, nz=40, dmax=200.0)
    u0, t0, s0, prm = make_inputs(model, 1, lat=20.0)
    st, prm, frc = model.initial_state(u0, t0, s0, prm)
    t_start = float(st.x[0, 0, 0])
    st, frc = model.run(st, prm, frc, num_steps=12)
    # column heat content must increase (net +~50 W/m2)
    dheat = float(((np.asarray(st.x[0, :, 0]) - np.asarray(t0[0]))
                   * np.asarray(model.grid.hm)).sum())
    assert dheat > 0.0


def test_land_columns_untouched():
    model = make_model(ncol=3)
    u0, t0, s0, prm = make_inputs(model, 3)
    prm = dataclasses.replace(
        prm,
        l_ocean=jnp.asarray([True, False, True]),
        run_physics=jnp.asarray([True, False, True]))
    st0, prm, frc = model.initial_state(u0, t0, s0, prm)
    st, frc = model.run(st0, prm, frc, num_steps=3)
    # land column state identical to its initial value
    np.testing.assert_array_equal(np.asarray(st.u[1]), np.asarray(st0.u[1]))
    np.testing.assert_array_equal(np.asarray(st.x[1]), np.asarray(st0.x[1]))
    assert float(st.hmix[1]) == float(st0.hmix[1])
    # ocean columns evolved
    assert not np.allclose(np.asarray(st.x[0]), np.asarray(st0.x[0]))


def test_columns_independent():
    """A column's evolution must not depend on its batch neighbours."""
    model = make_model(ncol=3)
    u0, t0, s0, prm = make_inputs(model, 3)
    # perturb column 1's initial temperature
    t0[1] += 1.0
    st, prm, frc = model.initial_state(u0, t0, s0, prm)
    st, frc = model.run(st, prm, frc, num_steps=4)

    model1 = make_model(ncol=1)
    u01, t01, s01, prm1 = make_inputs(model1, 1)
    st1, prm1, frc1 = model1.initial_state(u01, t01, s01, prm1)
    st1, frc1 = model1.run(st1, prm1, frc1, num_steps=4)
    np.testing.assert_allclose(np.asarray(st.x[0]), np.asarray(st1.x[0]),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.hmix[0]), np.asarray(st1.hmix[0]),
                               rtol=1e-12)
