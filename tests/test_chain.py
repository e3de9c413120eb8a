"""Multi-step dispatch chaining (models/chain.py, VERDICT r4 item 2):
the chained loop must produce a BITWISE-identical prognostic trajectory
to the per-step loop, and value-identical emitted diagnostic windows."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.io import netcdf_file

from mckpp_tpu import KppConfig, DomainConfig, TimeConfig, KppModel
from mckpp_tpu.grid import coriolis
from mckpp_tpu.state import init_params
from mckpp_tpu.io.diagnostics import DiagnosticsManager, Stream
from mckpp_tpu.models.chain import (ChainedStepper, plan_segments,
                                    emit_due, has_wide_reducing)
from mckpp_tpu import forcing as forcing_mod


def test_plan_segments_cadences():
    streams = [Stream("i", "instant", 3, fields=("T",)),
               Stream("m", "average", 9, fields=("hmix",))]
    diag = DiagnosticsManager(streams, 1, 1, np.linspace(0, -10, 4))

    def end(nt):
        return emit_due(diag, nt)

    segs = plan_segments(18, ndtocn=3, end_pred=end)
    # flux every 3 steps and emits at multiples of 3 -> uniform k=3 chains
    assert segs == [(1, 3), (4, 3), (7, 3), (10, 3), (13, 3), (16, 3)]
    # a start predicate splits a chain
    segs2 = plan_segments(6, ndtocn=3, end_pred=end,
                          start_pred=lambda nt: nt == 2)
    assert segs2 == [(1, 1), (2, 2), (4, 3)]
    # cap
    segs3 = plan_segments(10, ndtocn=100, end_pred=lambda nt: False,
                          max_k=4)
    assert segs3 == [(1, 4), (5, 4), (9, 2)]
    # every step emits -> k=1 everywhere
    segs4 = plan_segments(4, ndtocn=1, end_pred=lambda nt: True)
    assert segs4 == [(1, 1), (2, 1), (3, 1), (4, 1)]


def _setup(ncol=3, nz=16, wide=False, outdir="."):
    cfg = KppConfig(
        domain=DomainConfig(nx=ncol, ny=1, nz=nz, dmax=250.0),
        time=TimeConfig(dtsec=3600.0, ndtocn=3, startt=0.0, finalt=1.0),
        dtype="float32")
    model = KppModel(cfg)
    nzp1 = model.grid.nzp1
    zm = np.asarray(model.grid.zm)
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
    # mixed streams: instant every 2 steps, narrow mean every 4,
    # (optionally) a WIDE-field min stream every 4 — the wide variant
    # forces with_pre=True chains
    streams = [Stream("inst2", "instant", 2, fields=("T", "hmix")),
               Stream("mean4", "average", 4, fields=("S", "hmix")),
               Stream("min4", "minimum", 4,
                      fields=("difm",) if wide else ("T",))]
    diag = DiagnosticsManager(streams, nx=ncol, ny=1, zm=zm,
                              outdir=outdir, dto_seconds=cfg.time.dto,
                              async_write=False)
    return model, st, prm, frc, diag, cfg


@pytest.mark.parametrize("wide", [False, True])
def test_chain_bitwise_vs_per_step(tmp_path, wide):
    num_steps = 9

    # ---- per-step reference loop (the MCKPP_CHAIN=0 path) ---------------
    d_ref = tmp_path / "ref"
    model, st, prm, frc, diag, cfg = _setup(wide=wide, outdir=str(d_ref))
    st_ref = st
    for nt in range(1, num_steps + 1):
        need_full = diag.needs_full(nt)
        st_ref = model.step(st_ref, prm, frc, first_step=(nt <= 1),
                            with_diags=need_full)
        diag.step(nt, st_ref, prm, frc)
    paths_ref = diag.flush()

    # ---- chained loop ----------------------------------------------------
    d_ch = tmp_path / "chain"
    model2, st2, prm2, frc2, diag2, _ = _setup(wide=wide, outdir=str(d_ch))
    stepper = ChainedStepper(model2._step, diag2)
    assert stepper.wide_reducing == wide

    def end(nt):
        return (emit_due(diag2, nt)
                or (diag2.needs_full(nt) and not stepper.wide_reducing))

    segs = plan_segments(num_steps, ndtocn=cfg.time.ndtocn, end_pred=end)
    assert max(k for _, k in segs) > 1   # the test must actually chain
    st_ch = st2
    for nt0, k in segs:
        st_ch = stepper.run(nt0, k, st_ch, prm2, frc2)
    paths_ch = diag2.flush()

    # trajectory bitwise identical
    for f in dataclasses.fields(st_ref):
        a = np.asarray(getattr(st_ref, f.name))
        b = np.asarray(getattr(st_ch, f.name))
        np.testing.assert_array_equal(a, b, err_msg=f.name)

    # emitted windows value-identical
    assert set(paths_ref) == set(paths_ch)
    for key in paths_ref:
        with netcdf_file(paths_ref[key], "r", mmap=False) as na, \
                netcdf_file(paths_ch[key], "r", mmap=False) as nb:
            assert set(na.variables) == set(nb.variables)
            for vname in na.variables:
                np.testing.assert_array_equal(
                    np.asarray(na.variables[vname][:]),
                    np.asarray(nb.variables[vname][:]),
                    err_msg=f"{key}:{vname}")


def test_chain_first_step_flag(tmp_path):
    """A chain that includes step 1 must apply the first-step semantics
    (swdk seeding) to step 1 only — chain [1..2] equals two manual steps."""
    model, st, prm, frc, diag, cfg = _setup(outdir=str(tmp_path))
    st_a = model.step(st, prm, frc, first_step=True, with_diags=False)
    st_a = model.step(st_a, prm, frc, first_step=False, with_diags=False)

    stepper = ChainedStepper(model._step, diag)
    st_b, accums, inst = stepper.exec(1, 2, st, prm, frc, final_full=False)
    np.testing.assert_array_equal(np.asarray(st_a.x), np.asarray(st_b.x))
    np.testing.assert_array_equal(np.asarray(st_a.hmix),
                                  np.asarray(st_b.hmix))
