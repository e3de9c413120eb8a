"""Sharding: 1-device vs 8-device column-mesh equivalence.

The JAX analog of the reference's intended MPI-over-columns decomposition
(SURVEY.md section 2.6): results must be independent of the device mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mckpp_tpu import KppConfig, DomainConfig, TimeConfig, KppModel
from mckpp_tpu.grid import coriolis
from mckpp_tpu.state import init_params
from mckpp_tpu.parallel import sharding as sh
from mckpp_tpu import forcing as forcing_mod


def _build(ncol, nz=16):
    cfg = KppConfig(
        domain=DomainConfig(nx=ncol, ny=1, nz=nz, dmax=160.0),
        time=TimeConfig(dtsec=1200.0, ndtocn=1, startt=0.0, finalt=1.0))
    model = KppModel(cfg)
    nzp1 = nz + 1
    zm = np.asarray(model.grid.zm)
    rng = np.random.default_rng(7)
    t0 = 18.0 + 6.0 * np.exp(zm / 40.0) + rng.normal(0, 0.05, (ncol, nzp1))
    s0 = 35.0 - 0.3 * np.exp(zm / 80.0) + rng.normal(0, 0.005, (ncol, nzp1))
    u0 = np.zeros((ncol, nzp1, 2))
    prm = init_params(ncol, nzp1)
    lat = jnp.linspace(-40.0, 40.0, ncol)
    prm = dataclasses.replace(prm, f=coriolis(lat), dlat=lat)
    st, prm, frc = model.initial_state(u0, t0, s0, prm)
    raw = forcing_mod.constant_test_fluxes(ncol)
    st, frc = forcing_mod.update_fluxes(
        model.cfg, st, prm, frc, raw, jnp.asarray(True), model.grid.dm)
    return model, st, prm, frc


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_step_matches_single_device():
    ncol = 16
    model, st, prm, frc = _build(ncol)

    # single-device result
    out1 = model._step_jit(st, prm, frc, jnp.asarray(False))
    out1 = model._step_jit(out1, prm, frc, jnp.asarray(False))

    # 8-device column mesh
    mesh = sh.make_mesh(jax.devices()[:8])
    st8 = sh.shard_columns(st, mesh)
    prm8 = sh.shard_columns(prm, mesh)
    frc8 = sh.shard_columns(frc, mesh)
    step8 = sh.make_sharded_step(model, mesh)
    out8 = step8(st8, prm8, frc8, jnp.asarray(False))
    out8 = step8(out8, prm8, frc8, jnp.asarray(False))

    for name in ("u", "x", "hmix", "difm", "wx", "reset_flag"):
        a = np.asarray(getattr(out1, name))
        b = np.asarray(getattr(out8, name))
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-14,
                                   err_msg=f"mismatch in {name}")


def test_padding_marks_columns_inactive():
    ncol = 5
    model, st, prm, frc = _build(ncol, nz=10)
    stp, n0 = sh.pad_columns(st, 8)
    prmp, _ = sh.pad_columns(prm, 8)
    assert n0 == ncol
    assert jax.tree_util.tree_leaves(stp)[0].shape[0] == 8
    assert not bool(prmp.run_physics[5])
    assert bool(prmp.run_physics[0])
    back = sh.unpad_columns(stp, n0)
    np.testing.assert_array_equal(np.asarray(back.u), np.asarray(st.u))
