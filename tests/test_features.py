"""Feature-path tests: relaxation, flux corrections, overrides, damping,
double diffusion — the optional subsystems steered by the reference's L_*
flags (SURVEY.md sections 2.3-2.4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mckpp_tpu import (KppConfig, DomainConfig, TimeConfig, PhysicsFlags,
                       ForcingConfig, BoundaryConfig, KppModel)
from mckpp_tpu.grid import coriolis
from mckpp_tpu.state import init_params
from mckpp_tpu import forcing as forcing_mod

NCOL, NZ = 2, 8


def build(forcing_kw=None, boundary_kw=None, physics_kw=None):
    cfg = KppConfig(
        domain=DomainConfig(nx=NCOL, ny=1, nz=NZ, dmax=80.0),
        time=TimeConfig(dtsec=1200.0, ndtocn=1, startt=0.0, finalt=1.0),
        physics=PhysicsFlags(**(physics_kw or {})),
        forcing=ForcingConfig(**(forcing_kw or {})),
        boundary=BoundaryConfig(**(boundary_kw or {})))
    model = KppModel(cfg)
    nzp1 = NZ + 1
    zm = np.asarray(model.grid.zm)
    t0 = np.tile(20.0 + 4.0 * np.exp(zm / 30.0), (NCOL, 1))
    s0 = np.tile(35.0 - 0.2 * np.exp(zm / 50.0), (NCOL, 1))
    u0 = np.zeros((NCOL, nzp1, 2))
    prm = init_params(NCOL, nzp1)
    prm = dataclasses.replace(prm, f=coriolis(jnp.full((NCOL,), 10.0)))
    st, prm, frc = model.initial_state(u0, t0, s0, prm)
    return model, st, prm, frc


def run_steps(model, st, prm, frc, n=4):
    for nt in range(1, n + 1):
        raw = forcing_mod.constant_test_fluxes(NCOL)
        st, frc = forcing_mod.update_fluxes(model.cfg, st, prm, frc, raw,
                                            jnp.asarray(nt <= 1),
                                            model.grid.dm)
        st = model.step(st, prm, frc, first_step=(nt <= 1))
    return st, frc


def test_relax_sst_pulls_toward_target():
    model, st, prm, frc = build(
        boundary_kw=dict(l_relax_sst=True,
                         relax_sst_in=(1.0,)))  # tau = 1 day
    prm = dataclasses.replace(
        prm, relax_sst=jnp.full((NCOL,), 1.0 / (1.0 * 86400.0)))
    target = 28.0
    frc = dataclasses.replace(frc, sst0=jnp.full((NCOL,), target))
    t_start = float(st.x[0, 0, 0])
    st, frc = run_steps(model, st, prm, frc, n=6)
    t_end = float(st.x[0, 0, 0])
    assert abs(t_end - target) < abs(t_start - target)
    # fcorr diagnostic populated (W/m^2 surface correction)
    assert float(jnp.abs(st.fcorr).max()) > 0.0


def test_relax_calconly_does_not_modify_t():
    m1, st1, prm1, frc1 = build(
        boundary_kw=dict(l_relax_sst=True, l_relax_calconly=True,
                         relax_sst_in=(0.01,)))
    prm1 = dataclasses.replace(
        prm1, relax_sst=jnp.full((NCOL,), 1.0 / (0.01 * 86400.0)))
    frc1 = dataclasses.replace(frc1, sst0=jnp.full((NCOL,), 28.0))
    st1b, _ = run_steps(m1, st1, prm1, frc1, n=3)

    m0, st0, prm0, frc0 = build()
    st0b, _ = run_steps(m0, st0, prm0, frc0, n=3)
    # temperature evolution identical to no-relaxation run...
    np.testing.assert_allclose(np.asarray(st1b.x[..., 0]),
                               np.asarray(st0b.x[..., 0]), rtol=1e-12)
    # ...but the diagnostic flux correction is computed
    assert float(jnp.abs(st1b.fcorr).max()) > 0.0


def test_fcorr_2d_heats_surface():
    m1, st1, prm1, frc1 = build(forcing_kw=dict(l_fcorr=True))
    frc1 = dataclasses.replace(frc1, fcorr_twod=jnp.full((NCOL,), 500.0))
    st1b, _ = run_steps(m1, st1, prm1, frc1, n=4)
    m0, st0, prm0, frc0 = build()
    st0b, _ = run_steps(m0, st0, prm0, frc0, n=4)
    assert float(st1b.x[0, 0, 0]) > float(st0b.x[0, 0, 0])


def test_fcorr_withz_increments_profile():
    m1, st1, prm1, frc1 = build(forcing_kw=dict(l_fcorr_withz=True))
    fz = np.zeros((NCOL, NZ + 1))
    fz[:, 3] = 100.0                      # heat level 4 only (W/m^3)
    frc1 = dataclasses.replace(frc1, fcorr_withz=jnp.asarray(fz))
    st1b, _ = run_steps(m1, st1, prm1, frc1, n=2)
    # tinc_fcorr = dto*fcorr_withz/(rho*cp) at that level
    tinc = np.asarray(st1b.tinc_fcorr)
    assert np.all(tinc[:, 3] > 0.0)
    assert np.allclose(tinc[:, 0], 0.0) and np.allclose(tinc[:, 5], 0.0)
    # ocnTcorr is the inverse mapping (W/m^3)
    np.testing.assert_allclose(
        np.asarray(st1b.ocntcorr[:, 3]),
        tinc[:, 3] * np.asarray(st1b.rho[:, 3]) * np.asarray(st1b.cp[:, 3])
        / m1.cfg.time.dto, rtol=1e-12)


def test_relax_ocnt_and_sal_pull_toward_climatology():
    m1, st1, prm1, frc1 = build(
        boundary_kw=dict(l_relax_ocnt=True, l_relax_sal=True),
        forcing_kw=dict(ocnt_file="ocnT.nc", sal_file="sal.nc"))
    rate = 1.0 / (0.02 * 86400.0)
    prm1 = dataclasses.replace(prm1,
                               relax_ocnt=jnp.full((NCOL,), rate),
                               relax_sal=jnp.full((NCOL,), rate))
    t_clim = np.asarray(st1.x[..., 0]) - 3.0     # colder everywhere
    s_clim = np.asarray(st1.x[..., 1]) + 0.5
    frc1 = dataclasses.replace(frc1, ocnt_clim=jnp.asarray(t_clim),
                               sal_clim=jnp.asarray(s_clim))
    st1b, _ = run_steps(m1, st1, prm1, frc1, n=6)
    # deep levels (no surface forcing) move toward climatology
    assert float(st1b.x[0, 5, 0]) < float(st1.x[0, 5, 0])
    assert float(st1b.x[0, 5, 1]) > float(st1.x[0, 5, 1])
    # scorr diagnostic in psu/s
    assert float(jnp.abs(st1b.scorr).max()) > 0.0


def test_no_freeze_floor():
    model, st, prm, frc = build(forcing_kw=dict(l_no_freeze=True))
    # put some levels below -1.8C before the step
    x = np.array(st.x)
    x[:, 4:6, 0] = -5.0
    xs = np.array(st.xs)
    xs[:, 4:6, 0, :] = -5.0
    st = dataclasses.replace(st, x=jnp.asarray(x), xs=jnp.asarray(xs))
    st2, _ = run_steps(model, st, prm, frc, n=1)
    assert float(st2.x[:, 4:6, 0].min()) >= -1.8
    assert float(st2.freeze_flag.min()) > 0.0


def test_damp_curr_flags_and_reduction():
    m1, st1, prm1, frc1 = build(forcing_kw=dict(l_damp_curr=True, dtuvdamp=1))
    st1b, _ = run_steps(m1, st1, prm1, frc1, n=3)
    m0, st0, prm0, frc0 = build()
    st0b, _ = run_steps(m0, st0, prm0, frc0, n=3)
    # damping must reduce the surface current magnitude vs the undamped run
    assert (abs(float(st1b.u[0, 0, 0])) < abs(float(st0b.u[0, 0, 0])))
    assert float(st1b.dampu_flag.max()) > 0.0


def test_bottom_temp_pinned():
    model, st, prm, frc = build(forcing_kw=dict(l_vary_bottom_temp=True))
    frc = dataclasses.replace(frc, bottom_temp=jnp.full((NCOL,), 11.5))
    st2, _ = run_steps(model, st, prm, frc, n=2)
    np.testing.assert_allclose(np.asarray(st2.x[:, NZ, 0]), 11.5, rtol=1e-12)
    assert float(jnp.abs(st2.tinc_fcorr[:, NZ]).max()) >= 0.0


def test_ddmix_changes_solution():
    m1, st1, prm1, frc1 = build(physics_kw=dict(ldd=True))
    # destabilizing salinity gradient to trigger salt fingering
    x = np.array(st1.x)
    x[:, :4, 1] += np.linspace(0.8, 0.0, 4)     # salty surface
    xs = np.array(st1.xs)
    xs[:, :4, 1, :] += np.linspace(0.8, 0.0, 4)[None, :, None]
    st1 = dataclasses.replace(st1, x=jnp.asarray(x), xs=jnp.asarray(xs))
    st1b, _ = run_steps(m1, st1, prm1, frc1, n=2)

    m0, st0, prm0, frc0 = build()
    st0 = dataclasses.replace(st0, x=jnp.asarray(x), xs=jnp.asarray(xs))
    st0b, _ = run_steps(m0, st0, prm0, frc0, n=2)
    assert not np.allclose(np.asarray(st1b.x), np.asarray(st0b.x))


def test_check_profile_resets_on_comp_flag():
    from mckpp_tpu.ops.overrides import check_profile
    model, st, prm, frc = build(
        forcing_kw=dict(ocnt_file="T.nc", sal_file="S.nc"))
    t_clim = np.asarray(st.x[..., 0]) * 0 + 5.0
    s_clim = np.asarray(st.x[..., 1]) * 0 + 0.2
    frc = dataclasses.replace(frc, ocnt_clim=jnp.asarray(t_clim),
                              sal_clim=jnp.asarray(s_clim))
    uinit = np.asarray(prm.u_init)
    comp = jnp.asarray([True, False])
    out = jax.vmap(lambda s, p, f, c: check_profile(
        s, p, f, c, model.grid, model.cfg))(st, prm, frc, comp)
    np.testing.assert_allclose(np.asarray(out.x[0, :, 0]), 5.0)
    np.testing.assert_allclose(np.asarray(out.u[0]), uinit[0])
    assert float(out.reset_flag[0]) == 0.0   # zeroed: L_NO_ISOTHERM off
    np.testing.assert_allclose(np.asarray(out.x[1]), np.asarray(st.x[1]))


def test_isotherm_reset_keeps_999_semantics():
    from mckpp_tpu.ops.overrides import check_profile
    model, st, prm, frc = build(
        forcing_kw=dict(l_no_isotherm=True, isotherm_bottom=6,
                        isotherm_threshold=0.002,
                        ocnt_file="T.nc", sal_file="S.nc"))
    # isothermal column: constant T
    x = np.array(st.x)
    x[0, :, 0] = 10.0
    st = dataclasses.replace(st, x=jnp.asarray(x))
    t_clim = np.full((NCOL, NZ + 1), 7.0)
    s_clim = np.full((NCOL, NZ + 1), 0.1)
    frc = dataclasses.replace(frc, ocnt_clim=jnp.asarray(t_clim),
                              sal_clim=jnp.asarray(s_clim))
    st2 = dataclasses.replace(st, reset_flag=jnp.asarray([3.0, 3.0]))
    comp = jnp.asarray([False, False])
    out = jax.vmap(lambda s, p, f, c: check_profile(
        s, p, f, c, model.grid, model.cfg))(st2, prm, frc, comp)
    # column 0 (isothermal) reset to climatology, flag negated
    np.testing.assert_allclose(np.asarray(out.x[0, :, 0]), 7.0)
    assert float(out.reset_flag[0]) == -3.0
    # column 1 (stratified) untouched, flag preserved
    np.testing.assert_allclose(np.asarray(out.x[1]), np.asarray(st2.x[1]))
    assert float(out.reset_flag[1]) == 3.0
