"""Fused-pass parity: the fused one-kernel step (ops/fused_pass.py +
ops/ocnstep_fused.py) must reproduce the per-column reference path
(ops/ocnstep.py, vmapped) trajectory-exactly in float64, and the Pallas
interpreter must match the traced XLA body bitwise-ish.

This is the load-bearing oracle for the performance core: every branch the
fused kernel takes (under-relaxation, EOS, rimix, bldepth scan, blmix,
enhance, tridiagonal PCR solves, convergence masking, instability trap,
damping, history ping-pong) is cross-checked against the independently
written per-column implementation.
"""

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

NCOL, NZ = 3, 12


def build(pass_impl, forcing_kw=None, boundary_kw=None, physics_kw=None,
          lat=(5.0, 25.0, 45.0)):
    cfg = KppConfig(
        domain=DomainConfig(nx=NCOL, ny=1, nz=NZ, dmax=120.0),
        time=TimeConfig(dtsec=1200.0, ndtocn=1, startt=0.0, finalt=1.0),
        physics=PhysicsFlags(pass_impl=pass_impl, **(physics_kw or {})),
        forcing=ForcingConfig(**(forcing_kw or {})),
        boundary=BoundaryConfig(**(boundary_kw or {})))
    model = KppModel(cfg)
    nzp1 = NZ + 1
    zm = np.asarray(model.grid.zm)
    rng = np.random.RandomState(7)
    t0 = 20.0 + 5.0 * np.exp(zm / 40.0) + 0.05 * rng.randn(NCOL, nzp1)
    s0 = 35.0 - 0.3 * np.exp(zm / 60.0) + 0.01 * rng.randn(NCOL, nzp1)
    u0 = 0.02 * rng.randn(NCOL, nzp1, 2)
    prm = init_params(NCOL, nzp1)
    prm = dataclasses.replace(prm, f=coriolis(jnp.asarray(lat)))
    st, prm, frc = model.initial_state(u0, t0, s0, prm)
    return model, st, prm, frc


def run_steps(model, st, prm, frc, n, raw_fn=None):
    for nt in range(1, n + 1):
        raw = (raw_fn(nt) if raw_fn is not None
               else forcing_mod.constant_test_fluxes(NCOL))
        st, frc = forcing_mod.update_fluxes(model.cfg, st, prm, frc, raw,
                                            jnp.asarray(nt <= 1),
                                            model.grid.dm)
        st = model.step(st, prm, frc, first_step=(nt <= 1))
    return st


# typical magnitude of fields whose values sit far below O(1): the absolute
# tolerance is rtol * scale so near-zero entries can't hide drift behind a
# loose relative test (rho ~1e3 vs diffusivities ~1e-5 span 8 decades)
FIELD_SCALE = {"difm": 1e-2, "difs": 1e-2, "dift": 1e-2, "ghat": 1e2,
               "wu": 1e-3, "wx": 1e-3, "wxnt": 1e-3, "tinc_fcorr": 1e-2,
               "sinc_fcorr": 1e-3, "scorr": 1e-6}


def assert_states_close(sa, sb, rtol, atol=1e-12):
    for name in ("u", "x", "us", "xs", "hmix", "rho", "cp", "difm", "difs",
                 "dift", "ghat", "wu", "wx", "wxnt", "swdk_opt", "hmixd",
                 "tinc_fcorr", "sinc_fcorr", "scorr", "fcorr", "ssurf",
                 "reset_flag", "dampu_flag", "dampv_flag"):
        a, b = np.asarray(getattr(sa, name)), np.asarray(getattr(sb, name))
        atol_f = max(atol, rtol * FIELD_SCALE.get(name, 0.0))
        np.testing.assert_allclose(
            a, b, rtol=rtol, atol=atol_f, err_msg=f"field {name}")
    np.testing.assert_array_equal(np.asarray(sa.kmix), np.asarray(sb.kmix))
    np.testing.assert_array_equal(np.asarray(sa.old), np.asarray(sb.old))
    np.testing.assert_array_equal(np.asarray(sa.new), np.asarray(sb.new))


FEATURE_CASES = {
    "default": {},
    "ddmix": {"physics_kw": {"ldd": True}},
    "damping": {"forcing_kw": {"l_damp_curr": True, "dtuvdamp": 360.0}},
    "relax_sst": {"boundary_kw": {"l_relax_sst": True}},
    "fcorr_withz": {"forcing_kw": {"l_fcorr_withz": True}},
    "relax_ocnt_sal": {"boundary_kw": {"l_relax_ocnt": True,
                                       "l_relax_sal": True}},
    "advect": {"boundary_kw": {"l_advect": True}},
}


def _advection_params(prm, dtype):
    """Mixed rhsmod modes 1-7 across the 3 columns (solvers.F90:176-335);
    temperature-scalar modes are configured but must be IGNORED (the
    reference's ocnint applies rhsmod only for n=2,
    mckpp_physics_ocnint_mod.F90:179-184).  Chains with
    test_oracle_trajectory.py::test_trajectory_with_advection (per-column
    path vs the independent oracle) to pin the fused kernel's in-kernel
    rhsmod to the reference semantics."""
    nmode = np.zeros((NCOL, 2), np.int32)
    mode = np.zeros((NCOL, 6, 2), np.int32)
    mag = np.zeros((NCOL, 6, 2))
    nmode[0, 1] = 2
    mode[0, :2, 1] = [1, 3]
    mag[0, :2, 1] = [2.0e-6, -1.0e-6]
    nmode[1, 1] = 2
    mode[1, :2, 1] = [2, 4]
    mag[1, :2, 1] = [1.5e-6, 1.0e-6]
    nmode[2, 1] = 3
    mode[2, :3, 1] = [5, 6, 7]
    mag[2, :3, 1] = [1.0e-6, 2.0e-6, -5.0e-7]
    nmode[:, 0] = 1
    mode[:, 0, 0] = 3
    mag[:, 0, 0] = 50.0
    return dataclasses.replace(
        prm, nmodeadv=jnp.asarray(nmode), modeadv=jnp.asarray(mode),
        advection=jnp.asarray(mag, dtype))


@pytest.mark.slow
@pytest.mark.parametrize("impl", ["fused_xla", "fused_xla_step"])
@pytest.mark.parametrize("case", sorted(FEATURE_CASES))
def test_fused_matches_reference_trajectory(case, impl):
    """Both the per-pass fused body and the WHOLE-STEP fused body
    (fused_pass._step_body — what ships on TPU as pallas_step) must
    reproduce the per-column reference path for every feature case."""
    kw = FEATURE_CASES[case]
    model_r, st_r, prm_r, frc_r = build("reference", **kw)
    model_f, st_f, prm_f, frc_f = build(impl, **kw)
    if kw.get("boundary_kw", {}).get("l_relax_sst"):
        rlx = jnp.full((NCOL,), 1.0 / (5.0 * 86400.0))
        prm_r = dataclasses.replace(prm_r, relax_sst=rlx)
        prm_f = dataclasses.replace(prm_f, relax_sst=rlx)
        frc_r = dataclasses.replace(frc_r, sst0=jnp.full((NCOL,), 24.0))
        frc_f = dataclasses.replace(frc_f, sst0=jnp.full((NCOL,), 24.0))
    if kw.get("boundary_kw", {}).get("l_relax_ocnt"):
        ro = jnp.full((NCOL,), 1.0 / (3.0 * 86400.0))
        rs = jnp.full((NCOL,), 1.0 / (4.0 * 86400.0))
        nzp1 = NZ + 1
        oc = jnp.tile(jnp.asarray(np.linspace(22.0, 10.0, nzp1)), (NCOL, 1))
        sc = jnp.zeros((NCOL, nzp1)) + 0.1
        prm_r = dataclasses.replace(prm_r, relax_ocnt=ro, relax_sal=rs)
        prm_f = dataclasses.replace(prm_f, relax_ocnt=ro, relax_sal=rs)
        frc_r = dataclasses.replace(frc_r, ocnt_clim=oc, sal_clim=sc)
        frc_f = dataclasses.replace(frc_f, ocnt_clim=oc, sal_clim=sc)
    if kw.get("forcing_kw", {}).get("l_fcorr_withz"):
        fz = jnp.tile(jnp.asarray(np.linspace(30.0, 0.0, NZ + 1)), (NCOL, 1))
        frc_r = dataclasses.replace(frc_r, fcorr_withz=fz)
        frc_f = dataclasses.replace(frc_f, fcorr_withz=fz)
    if kw.get("boundary_kw", {}).get("l_advect"):
        prm_r = _advection_params(prm_r, model_r.dtype)
        prm_f = _advection_params(prm_f, model_f.dtype)

    out_r = run_steps(model_r, st_r, prm_r, frc_r, n=4)
    out_f = run_steps(model_f, st_f, prm_f, frc_f, n=4)
    assert_states_close(out_f, out_r, rtol=1e-9)


@pytest.mark.slow
def test_fused_instability_trap_and_damping_parity():
    """Non-vacuous coverage of the instability trap, reset-999 and current
    damping (mckpp_physics_ocnstep_mod.F90:194-236, 317-340): hurricane-force
    wind stress on column 0 blows the depth-weighted RMSD check, so the trap
    retries with f*=1.01 and ultimately resets the column (reset_flag=999,
    preserved because L_NO_ISOTHERM keeps check_profile from zeroing it,
    mckpp_physics_overrides.F90:121-123).  The fused path must reproduce the
    per-column path through all of it, and the flags must actually fire."""
    kw = dict(
        forcing_kw={"l_damp_curr": True, "dtuvdamp": 360,
                    "l_no_isotherm": True, "isotherm_bottom": 4,
                    "isotherm_threshold": 1e-12,
                    "ocnt_file": "clim.nc", "sal_file": "clim.nc"})
    model_r, st_r, prm_r, frc_r = build("reference", **kw)
    model_f, st_f, prm_f, frc_f = build("fused_xla", **kw)

    def violent(nt):
        raw = forcing_mod.constant_test_fluxes(NCOL)
        taux = jnp.asarray([400.0] + [0.01] * (NCOL - 1))
        return raw._replace(taux=taux)

    out_r = run_steps(model_r, st_r, prm_r, frc_r, n=3, raw_fn=violent)
    out_f = run_steps(model_f, st_f, prm_f, frc_f, n=3, raw_fn=violent)

    # the trap genuinely fired and the reset survived to the diagnostics:
    # +-999 (the isotherm detector also fires after the reset zeroes T to
    # the climatology, flipping the sign — mckpp_physics_overrides.F90:116-119)
    assert abs(float(out_r.reset_flag[0])) == 999.0, \
        "instability trap did not fire — vacuous parity case"
    assert np.all(np.abs(np.asarray(out_r.reset_flag[1:])) != 999.0)
    # damping flags are nonzero fractions
    assert float(out_r.dampu_flag[1]) > 0.0
    assert_states_close(out_f, out_r, rtol=1e-9)


@pytest.mark.parametrize("interp_impl,xla_impl", [
    ("pallas_interpret", "fused_xla"),
    ("pallas_step_interpret", "fused_xla_step"),
])
@pytest.mark.parametrize("case", ["default", "advect"])
def test_pallas_interpret_matches_fused_xla(case, interp_impl, xla_impl):
    """The identical kernel bodies under the Pallas interpreter (what runs
    on TPU, minus Mosaic codegen) must match the traced XLA paths —
    including the in-kernel advection (rhsmod) bases and the whole-step
    kernel's in-kernel while loops."""
    kw = {"boundary_kw": {"l_advect": True}} if case == "advect" else {}
    model_f, st_f, prm_f, frc_f = build(xla_impl, **kw)
    model_p, st_p, prm_p, frc_p = build(
        interp_impl, physics_kw={"pass_block": NCOL}, **kw)
    if case == "advect":
        prm_f = _advection_params(prm_f, model_f.dtype)
        prm_p = _advection_params(prm_p, model_p.dtype)
    out_f = run_steps(model_f, st_f, prm_f, frc_f, n=2)
    out_p = run_steps(model_p, st_p, prm_p, frc_p, n=2)
    assert_states_close(out_p, out_f, rtol=1e-12, atol=1e-14)


def test_fused_handles_land_mask():
    """Inactive (land) columns must pass through the fused step unchanged."""
    model, st, prm, frc = build("fused_xla")
    prm = dataclasses.replace(
        prm, run_physics=jnp.asarray([True, False, True]))
    out = run_steps(model, st, prm, frc, n=2)
    np.testing.assert_array_equal(np.asarray(out.x[1]), np.asarray(st.x[1]))
    assert not np.allclose(np.asarray(out.x[0]), np.asarray(st.x[0]))


def test_analytic_wscale_close_to_nodal():
    """wscale_mode='analytic' (exact LMD stability functions, the fast
    production option) must track the reference's table interpolation to
    within the table's own discretization error over a short trajectory."""
    model_n, st_n, prm_n, frc_n = build("fused_xla")
    model_a, st_a, prm_a, frc_a = build(
        "fused_xla", physics_kw={"wscale_mode": "analytic"})
    out_n = run_steps(model_n, st_n, prm_n, frc_n, n=4)
    out_a = run_steps(model_a, st_a, prm_a, frc_a, n=4)
    np.testing.assert_allclose(np.asarray(out_a.x), np.asarray(out_n.x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_a.hmix), np.asarray(out_n.hmix),
                               rtol=5e-3, atol=1e-3)
