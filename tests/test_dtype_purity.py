"""An f32 model must trace to an f32-pure program even under
jax_enable_x64 (the suite's reference-precision mode).

Strongly-typed float64 leaks — np.float64 coefficient tables, uncast
numpy inputs — silently promote parts of the physics to f64 on CPU
(and would break Mosaic lowering on TPU), while masking themselves by
casting back at the first scatter.  Regression test for the Jerlov
table leak fixed in round 5 (ops/swfrac.py:_coeffs): trace the FULL
production step and the init pass of a float32 model and assert no
float64 value appears anywhere in the jaxpr.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mckpp_tpu import KppConfig, DomainConfig, TimeConfig, KppModel
from mckpp_tpu.grid import coriolis
from mckpp_tpu.state import init_params
from mckpp_tpu import forcing as forcing_mod


def _f64_eqns(jaxpr, out, path="root"):
    """Collect equations producing float64 outputs, recursing into
    sub-jaxprs (pjit bodies, while/scan/cond branches, pallas grids)."""
    for eqn in jaxpr.eqns:
        for ov in eqn.outvars:
            dt = getattr(ov.aval, "dtype", None)
            # weak-typed f64 (python-literal broadcasts) adapt to f32 on
            # first combine — only STRONG f64 is a leak
            if (dt is not None and dt == jnp.float64
                    and not getattr(ov.aval, "weak_type", False)):
                out.append((path, eqn.primitive.name, str(ov.aval)))
        for key, val in eqn.params.items():
            vals = val if isinstance(val, (tuple, list)) else [val]
            for v in vals:
                inner = getattr(v, "jaxpr", None)
                if inner is not None:
                    _f64_eqns(getattr(inner, "jaxpr", inner), out,
                              f"{path}/{eqn.primitive.name}")
    return out


def _build_f32(ncol=3, nz=12):
    cfg = KppConfig(
        domain=DomainConfig(nx=ncol, ny=1, nz=nz, dmax=200.0),
        time=TimeConfig(dtsec=3600.0, ndtocn=3, startt=0.0, finalt=1.0),
        dtype="float32")
    model = KppModel(cfg)
    nzp1 = model.grid.nzp1
    zm = np.asarray(model.grid.zm, np.float64)   # deliberately f64 inputs
    t0 = np.tile(20.0 + 5.0 * np.exp(zm / 50.0), (ncol, 1))
    s0 = np.tile(35.0 - 0.5 * np.exp(zm / 100.0), (ncol, 1))
    u0 = np.zeros((ncol, nzp1, 2))
    prm = init_params(ncol, nzp1, dtype=model.dtype)
    lat = jnp.linspace(5.0, 25.0, ncol, dtype=model.dtype)
    prm = dataclasses.replace(prm, f=coriolis(lat), dlat=lat,
                              ocdepth=jnp.full((ncol,), -10000.0,
                                               model.dtype))
    st, prm, frc = model.initial_state(u0, t0, s0, prm)
    raw = forcing_mod.constant_test_fluxes(ncol, model.dtype)
    st, frc = forcing_mod.update_fluxes(cfg, st, prm, frc, raw,
                                        jnp.asarray(True), model.grid.dm)
    return model, st, prm, frc


@pytest.mark.parametrize("with_diags", [False, True])
def test_f32_step_traces_f64_free(with_diags):
    assert jax.config.jax_enable_x64, "suite precision mode expected"
    model, st, prm, frc = _build_f32()
    jaxpr = jax.make_jaxpr(
        lambda s: model._step(s, prm, frc, jnp.asarray(False),
                              with_diags=with_diags))(st)
    leaks = _f64_eqns(jaxpr.jaxpr, [])
    assert not leaks, f"float64 leaked into the f32 step: {leaks[:8]}"


def test_f32_init_pass_traces_f64_free():
    """The per-column init vmix pass (where the Jerlov-table leak lived:
    bldepth's bfsfc/stable/case_a chain)."""
    model, st, prm, frc = _build_f32()
    jaxpr = jax.make_jaxpr(
        lambda s: model._init_columns(s, prm, frc))(st)
    leaks = _f64_eqns(jaxpr.jaxpr, [])
    assert not leaks, f"float64 leaked into the f32 init pass: {leaks[:8]}"


def test_f32_state_is_f32():
    model, st, prm, frc = _build_f32()
    for tree, name in ((st, "state"), (frc, "forcing")):
        for leaf in jax.tree_util.tree_leaves(tree):
            dt = getattr(leaf, "dtype", None)
            if dt is not None and jnp.issubdtype(dt, jnp.floating):
                assert dt == jnp.float32, f"{name} leaf is {dt}"
