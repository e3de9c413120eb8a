"""Sharded output path performs no per-step host gathers (VERDICT r2
item 2): diagnostics accumulate on the sharded device arrays and gather
only when a window emits; the restart gather is gated on its cadence."""

import dataclasses

import jax
import numpy as np
import pytest

from mckpp_tpu.io import diagnostics as diag
from mckpp_tpu.io.restart import RestartControl
from mckpp_tpu.parallel import sharding as sh
from mckpp_tpu.parallel import distributed as dist

from test_io import _build


class CountingLayout:
    """Wraps a ColumnLayout, counting gather() calls."""

    def __init__(self, inner):
        self.inner = inner
        self.gathers = 0

    def gather(self, arr):
        self.gathers += 1
        return self.inner.gather(arr)

    def __getattr__(self, name):
        return getattr(self.inner, name)


def test_diag_gathers_only_on_emit(tmp_path):
    ncol = 6
    model, st, prm, frc = _build(ncol=ncol, nx=ncol)
    mesh = sh.make_mesh(jax.devices()[:2])
    layout = CountingLayout(dist.make_layout(ncol, mesh))
    st_s = layout.shard_tree(st)
    prm_s = layout.shard_tree(prm)
    frc_s = layout.shard_tree(frc)

    streams = [diag.Stream("s3", "average", 3, fields=("T", "hmix")),
               diag.Stream("s6", "maximum", 6, fields=("hmix",))]
    dm = diag.DiagnosticsManager(streams, nx=ncol, ny=1, zm=model.grid.zm,
                                 outdir=str(tmp_path), dto_seconds=1200.0,
                                 async_write=False)
    dm.set_layout(layout)

    per_step = []
    for nt in range(1, 7):
        before = layout.gathers
        dm.step(nt, st_s, prm_s, frc_s)
        per_step.append(layout.gathers - before)
    # single-process: the step loop performs ZERO gathers — emitted
    # windows keep device arrays and the writer fetches them at
    # flush/split time, off the step path (multi-process would gather
    # synchronously once per emit: 2 at step 3, 3 at step 6)
    assert per_step == [0, 0, 0, 0, 0, 0], per_step
    before = layout.gathers
    dm.flush()
    # flush fetches each emitted record's fields: s3 emitted twice
    # (2 fields each) + s6 once (1 field)
    assert layout.gathers - before == 5

    # emitted values equal the unsharded reference computation
    fields = diag.extract_fields(st, prm, frc)
    from mckpp_tpu.io import ncio
    with ncio.open_nc(str(tmp_path / "s3.nc")) as nc:
        t_mean = ncio.get_var(nc, "T")
    np.testing.assert_allclose(
        t_mean[0].reshape(len(model.grid.zm), ncol).T,
        np.asarray(fields["T"]), rtol=1e-12)


def test_restart_gather_gated_on_cadence(tmp_path):
    rc = RestartControl(str(tmp_path / "r"), ndt_per_restart=4,
                        num_timesteps=10, dto=1200.0, start_days=0.0)
    assert [rc.due(nt) for nt in range(1, 11)] == [
        False, False, False, True, False, False, False, True, False, True]


def test_shard_write_mode_merges_to_single_writer_output(tmp_path):
    """write_mode='shard' (VERDICT r3 item 4, the XIOS multiple_file
    analog): per-process slab files carry the shard geometry, perform ZERO
    layout.gather calls, and merge_shard_files reassembles output
    value-identical to the single-writer path."""
    ncol = 8
    model, st, prm, frc = _build(ncol=ncol, nx=ncol)
    # land-mask one column so the fill path is exercised through both modes
    import jax.numpy as jnp
    l_ocean = np.ones(ncol, bool)
    l_ocean[5] = False

    def run(mode, outdir):
        mesh = sh.make_mesh(jax.devices()[:2])
        layout = CountingLayout(dist.make_layout(ncol, mesh))
        st_s = layout.shard_tree(st)
        prm_s = layout.shard_tree(prm)
        frc_s = layout.shard_tree(frc)
        streams = [diag.Stream("sm", "average", 3, fields=("T", "hmix"),
                               split_freq_days=None)]
        dm = diag.DiagnosticsManager(
            streams, nx=ncol, ny=1, zm=model.grid.zm, outdir=str(outdir),
            dto_seconds=1200.0, l_ocean=l_ocean, async_write=False,
            write_mode=mode)
        dm.set_layout(layout)
        for nt in range(1, 7):
            dm.step(nt, st_s, prm_s, frc_s)
        paths = dm.flush()
        assert dm.emit_gathers == 0
        return paths

    p_single = run("single", tmp_path / "single")
    p_shard = run("shard", tmp_path / "shard")
    # single process -> one _p0 shard covering the whole domain
    shard_files = sorted((tmp_path / "shard").glob("*.nc"))
    assert [p.name for p in shard_files] == ["sm_p0.nc"]
    merged = diag.merge_shard_files(
        shard_files, str(tmp_path / "merged.nc"))
    from mckpp_tpu.io import ncio
    with ncio.open_nc(str(tmp_path / "single" / "sm.nc")) as a, \
            ncio.open_nc(merged) as b:
        assert set(a.variables) == set(b.variables)
        for v in a.variables:
            np.testing.assert_array_equal(
                np.asarray(a.variables[v][:]), np.asarray(b.variables[v][:]),
                err_msg=v)
    # the masked column is FILL_VALUE in the merged output
    with ncio.open_nc(merged) as nc:
        T = ncio.get_var(nc, "T")
        assert (T[:, :, 0, 5] == diag.FILL_VALUE).all()
        assert np.isfinite(T[:, :, 0, :5]).all() and (T[:, :, 0, :5] != diag.FILL_VALUE).all()


def test_async_writer_materializes_off_the_loop_thread(tmp_path):
    """With the production async writer, emitted windows materialize
    EAGERLY on the writer thread (device buffers free promptly — holding a
    day of records in HBM OOMed the 648k-column ensemble) and the loop
    thread itself never fetches."""
    import threading

    ncol = 6
    model, st, prm, frc = _build(ncol=ncol, nx=ncol)
    mesh = sh.make_mesh(jax.devices()[:2])
    main = threading.main_thread()
    inner = dist.make_layout(ncol, mesh)

    class ThreadCountingLayout(CountingLayout):
        def __init__(self, inner):
            super().__init__(inner)
            self.main_thread_gathers = 0

        def gather(self, arr):
            if threading.current_thread() is main:
                self.main_thread_gathers += 1
            return super().gather(arr)

    layout = ThreadCountingLayout(inner)
    st_s = layout.shard_tree(st)
    prm_s = layout.shard_tree(prm)
    frc_s = layout.shard_tree(frc)
    streams = [diag.Stream("a3", "average", 3, fields=("T", "hmix"))]
    dm = diag.DiagnosticsManager(streams, nx=ncol, ny=1, zm=model.grid.zm,
                                 outdir=str(tmp_path), dto_seconds=1200.0,
                                 async_write=True)
    dm.set_layout(layout)
    for nt in range(1, 7):
        dm.step(nt, st_s, prm_s, frc_s)
    dm.flush()
    assert layout.main_thread_gathers == 0
    assert layout.gathers == 4          # 2 emits x 2 fields, writer thread
    fields = diag.extract_fields(st, prm, frc)
    from mckpp_tpu.io import ncio
    with ncio.open_nc(str(tmp_path / "a3.nc")) as nc:
        t_mean = ncio.get_var(nc, "T")
    np.testing.assert_allclose(
        t_mean[0].reshape(len(model.grid.zm), ncol).T,
        np.asarray(fields["T"]), rtol=1e-12)


def test_emit_backpressure_bounds_inflight_bytes(tmp_path, monkeypatch):
    """A tiny MCKPP_DIAG_MAX_PENDING_MB forces the emit-time drain loop:
    in-flight window bytes never exceed one window beyond the cap, and
    output values are unchanged."""
    monkeypatch.setenv("MCKPP_DIAG_MAX_PENDING_MB", "0.001")   # ~1 kB
    ncol = 6
    model, st, prm, frc = _build(ncol=ncol, nx=ncol)
    mesh = sh.make_mesh(jax.devices()[:2])
    layout = dist.make_layout(ncol, mesh)
    st_s = layout.shard_tree(st)
    prm_s = layout.shard_tree(prm)
    frc_s = layout.shard_tree(frc)
    s = diag.Stream("bp", "instant", 1, fields=("T", "hmix"))
    dm = diag.DiagnosticsManager([s], nx=ncol, ny=1, zm=model.grid.zm,
                                 outdir=str(tmp_path), dto_seconds=1200.0,
                                 async_write=True)
    dm.set_layout(layout)
    for nt in range(1, 7):
        dm.step(nt, st_s, prm_s, frc_s)
        # every emit exceeds the 1 kB cap, so at most ONE window stays in
        # flight after the drain loop
        assert len(dm._inflight) <= 1
    dm.flush()
    from mckpp_tpu.io import ncio
    fields = diag.extract_fields(st, prm, frc)
    with ncio.open_nc(str(tmp_path / "bp.nc")) as nc:
        t = ncio.get_var(nc, "T")
    assert t.shape[0] == 6
    np.testing.assert_allclose(
        t[-1].reshape(len(model.grid.zm), ncol).T,
        np.asarray(fields["T"]), rtol=1e-12)
