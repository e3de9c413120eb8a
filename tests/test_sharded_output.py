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
