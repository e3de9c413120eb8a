"""Diagnostics engine + restart exactness tests."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from mckpp_tpu import KppConfig, DomainConfig, TimeConfig, KppModel
from mckpp_tpu.grid import coriolis
from mckpp_tpu.state import init_params
from mckpp_tpu.io import diagnostics as diag
from mckpp_tpu.io import restart as rst
from mckpp_tpu.io import ncio
from mckpp_tpu import forcing as forcing_mod


def _build(ncol=4, nz=12, nx=None, ny=1):
    nx = nx or ncol
    cfg = KppConfig(
        domain=DomainConfig(nx=nx, ny=ny, nz=nz, dmax=120.0),
        time=TimeConfig(dtsec=1200.0, ndtocn=1, startt=0.0, finalt=1.0))
    model = KppModel(cfg)
    nzp1 = nz + 1
    zm = np.asarray(model.grid.zm)
    t0 = np.tile(18.0 + 6.0 * np.exp(zm / 40.0), (ncol, 1))
    s0 = np.tile(35.0 - 0.3 * np.exp(zm / 80.0), (ncol, 1))
    u0 = np.zeros((ncol, nzp1, 2))
    prm = init_params(ncol, nzp1)
    prm = dataclasses.replace(prm, f=coriolis(jnp.full((ncol,), 15.0)))
    st, prm, frc = model.initial_state(u0, t0, s0, prm)
    return model, st, prm, frc


def test_extract_fields_catalog():
    model, st, prm, frc = _build()
    fields = diag.extract_fields(st, prm, frc)
    assert set(diag.DEPTH_FIELDS + diag.SURFACE_FIELDS) == set(fields)
    nzp1 = model.grid.nzp1
    for k in diag.DEPTH_FIELDS:
        assert fields[k].shape == (4, nzp1), k
    for k in diag.SURFACE_FIELDS:
        assert fields[k].shape == (4,), k
    # salinity has Sref restored
    np.testing.assert_allclose(
        np.asarray(fields["S"]),
        np.asarray(st.x[..., 1] + prm.sref[:, None]), rtol=1e-14)
    # dif* shifted one level down with zero surface
    assert np.all(np.asarray(fields["difm"][:, 0]) == 0.0)
    np.testing.assert_allclose(np.asarray(fields["difm"][:, 1:]),
                               np.asarray(st.difm[:, 1:model.grid.nz + 1]))


def test_stream_reductions(tmp_path):
    model, st, prm, frc = _build()
    streams = [diag.Stream("inst", "instant", 2, fields=("T", "hmix")),
               diag.Stream("mean", "average", 2, fields=("T", "hmix")),
               diag.Stream("mx", "maximum", 2, fields=("hmix",))]
    dm = diag.DiagnosticsManager(streams, nx=4, ny=1, zm=model.grid.zm,
                                 outdir=str(tmp_path), dto_seconds=1200.0)
    raw = forcing_mod.constant_test_fluxes(4)
    st1, frc = forcing_mod.update_fluxes(model.cfg, st, prm, frc, raw,
                                         jnp.asarray(True), model.grid.dm)
    st1 = model.step(st1, prm, frc, first_step=True)
    dm.step(1, st1, prm, frc)
    st2 = model.step(st1, prm, frc)
    dm.step(2, st2, prm, frc)
    paths = dm.flush()
    # instant stream holds the step-2 values
    with ncio.open_nc(paths["inst"]) as nc:
        t_inst = ncio.get_var(nc, "T")
    np.testing.assert_allclose(
        t_inst[0, :, 0, :].T, np.asarray(st2.x[..., 0]), rtol=1e-12)
    # mean stream holds the average of steps 1 and 2
    with ncio.open_nc(paths["mean"]) as nc:
        t_mean = ncio.get_var(nc, "T")
        h_mean = ncio.get_var(nc, "hmix")
    expect = (np.asarray(st1.x[..., 0]) + np.asarray(st2.x[..., 0])) / 2
    np.testing.assert_allclose(t_mean[0, :, 0, :].T, expect, rtol=1e-12)
    np.testing.assert_allclose(
        h_mean[0, 0], (np.asarray(st1.hmix) + np.asarray(st2.hmix)) / 2,
        rtol=1e-12)
    with ncio.open_nc(paths["mx"]) as nc:
        h_max = ncio.get_var(nc, "hmix")
    np.testing.assert_allclose(
        h_max[0, 0],
        np.maximum(np.asarray(st1.hmix), np.asarray(st2.hmix)), rtol=1e-12)


def test_restart_roundtrip_exact(tmp_path):
    model, st, prm, frc = _build()
    raw = forcing_mod.constant_test_fluxes(4)
    st, frc = forcing_mod.update_fluxes(model.cfg, st, prm, frc, raw,
                                        jnp.asarray(True), model.grid.dm)
    st = model.step(st, prm, frc, first_step=True)
    p = rst.save_restart(str(tmp_path / "rs"), st, prm, frc, 1, 0.0, 1200.0)
    st2, prm2, frc2, ntime, tdays = rst.load_restart(p)
    for f in dataclasses.fields(st):
        np.testing.assert_array_equal(
            np.asarray(getattr(st, f.name)), np.asarray(getattr(st2, f.name)),
            err_msg=f.name)
    assert ntime == 1


def test_exact_resume_equivalence(tmp_path):
    """Run 6 steps straight == run 3, checkpoint, reload, run 3 more."""
    model, st0, prm, frc0 = _build(ncol=2, nz=10)

    sta, frca = model.run(st0, prm, frc0, num_steps=6)

    stb, frcb = model.run(st0, prm, frc0, num_steps=3)
    p = rst.save_restart(str(tmp_path / "rs"), stb, prm, frcb, 3, 0.0, 1200.0)
    stc, prmc, frcc, ntime, _ = rst.load_restart(p)
    # continue: steps 4..6 (not first step; flux cadence every step here)
    for nt in range(4, 7):
        raw = forcing_mod.constant_test_fluxes(2)
        stc, frcc = forcing_mod.update_fluxes(
            model.cfg, stc, prmc, frcc, raw, jnp.asarray(False), model.grid.dm)
        stc = model.step(stc, prmc, frcc, first_step=False)

    for f in dataclasses.fields(sta):
        np.testing.assert_array_equal(
            np.asarray(getattr(sta, f.name)), np.asarray(getattr(stc, f.name)),
            err_msg=f.name)


def test_reference_restart_export(tmp_path):
    model, st, prm, frc = _build(ncol=4, nx=2, ny=2)
    path = rst.export_reference_restart(
        str(tmp_path / "ref_restart.nc"), st, prm, 2, 2, 0.0, 1200.0)
    with ncio.open_nc(path) as nc:
        for name in ("uvel", "vvel", "T", "S", "CP", "rho", "hmix", "kmix",
                     "Sref", "SSref", "Ssurf", "Tref", "old", "new",
                     "Us", "Vs", "Ts", "Ss", "hmixd", "time"):
            assert name in nc.variables, name
        t = ncio.get_var(nc, "T")
    assert t.shape == (model.grid.nzp1, 2, 2)


def test_reference_restart_import_roundtrip(tmp_path):
    """Export -> import -> step must equal native-resume -> step: the
    reference restart field set (mckpp_xios_io.F90:436-465) carries
    everything needed for exact continuation."""
    from mckpp_tpu.state import init_state, init_forcing

    model, st, prm, frc = _build(ncol=4, nx=2, ny=2)
    # advance a few steps so the history/phase state is non-trivial
    st, frc = model.run(st, prm, frc, num_steps=3)
    path = rst.export_reference_restart(
        str(tmp_path / "ref_restart.nc"), st, prm, 2, 2, 0.0, 1200.0)

    nzp1 = model.grid.nzp1
    st_i = init_state(4, nzp1, model.dtype)
    prm_i = dataclasses.replace(init_params(4, nzp1),
                                f=prm.f, jerlov=prm.jerlov,
                                u_init=prm.u_init)
    st_i, prm_i, tdays = rst.import_reference_restart(
        path, st_i, prm_i, grid=model.grid)
    assert tdays == pytest.approx(1200.0 / 86400.0)

    # imported prognostic + history fields match the source state exactly
    for name in ("u", "x", "us", "xs", "hmixd", "hmix", "old", "new",
                 "rho", "cp", "ssurf", "tref"):
        np.testing.assert_array_equal(np.asarray(getattr(st, name)),
                                      np.asarray(getattr(st_i, name)),
                                      err_msg=name)
    np.testing.assert_array_equal(np.asarray(prm.sref), np.asarray(prm_i.sref))

    # one further step from the import == one further step natively
    def advance(s, p, f):
        raw = forcing_mod.constant_test_fluxes(4)
        s, f = forcing_mod.update_fluxes(model.cfg, s, p, f, raw,
                                         jnp.asarray(False), model.grid.dm)
        return model.step(s, p, f, first_step=False)

    st_nat = advance(st, prm, frc)
    st_imp = advance(st_i, prm_i, init_forcing(4, nzp1, model.dtype))
    for name in ("u", "x", "hmix", "us", "xs", "old", "new"):
        np.testing.assert_allclose(np.asarray(getattr(st_nat, name)),
                                   np.asarray(getattr(st_imp, name)),
                                   rtol=1e-12, atol=1e-14, err_msg=name)


def test_diagnostics_daily_split_masking_bounded_memory(tmp_path):
    """XIOS output semantics (run/iodef.xml:88: split_freq='1d';
    mckpp_xios_io.F90:58: land masked via mask_1d): records stream to one
    file per split window as the window closes, land columns are written
    as the fill value, and the host buffer never holds more than one
    window's records."""
    model, st, prm, frc = _build(ncol=4, nz=10)
    l_ocean = np.array([False, True, True, True])
    streams = [diag.Stream("spl", "instant", 1, fields=("T", "hmix"),
                           split_freq_days=1.0)]
    dm = diag.DiagnosticsManager(streams, nx=4, ny=1, zm=model.grid.zm,
                                 outdir=str(tmp_path),
                                 dto_seconds=0.25 * 86400.0,
                                 l_ocean=l_ocean)
    max_buffered = 0
    for nt in range(1, 9):                    # 8 records, 0.25 d apart
        dm.step(nt, st, prm, frc)
        max_buffered = max(max_buffered, len(dm._records["spl"]))
    paths = dm.flush()
    # one window = 4 records; buffer never exceeded one window
    assert max_buffered <= 4
    files = sorted(tmp_path.glob("spl_*.nc"))
    assert len(files) == 2, files
    with ncio.open_nc(str(files[0])) as nc:
        t = ncio.get_var(nc, "T")
        times = ncio.get_var(nc, "time")
    assert t.shape[0] == 4
    np.testing.assert_allclose(times, [0.25, 0.5, 0.75, 1.0])
    # land column masked with the fill value, sea columns are real data
    assert np.all(t[:, :, 0, 0] == diag.FILL_VALUE)
    assert np.all(np.abs(t[:, :, 0, 1:]) < 1e3)
    with ncio.open_nc(str(files[1])) as nc:
        times2 = ncio.get_var(nc, "time")
    np.testing.assert_allclose(times2, [1.25, 1.5, 1.75, 2.0])


def test_default_streams_follow_dto():
    """Stream cadences are wall-clock (1h/3h, run/iodef.xml:91-155) and must
    be converted using the run's actual dto, not an assumed 1200 s."""
    s1200 = {s.name: s.freq for s in diag.default_streams(1200.0)}
    assert s1200 == {"kpp_1h_inst": 3, "kpp_3h_mean": 9,
                     "kpp_3h_min": 9, "kpp_3h_max": 9}
    s3600 = {s.name: s.freq for s in diag.default_streams(3600.0)}
    assert s3600 == {"kpp_1h_inst": 1, "kpp_3h_mean": 3,
                     "kpp_3h_min": 3, "kpp_3h_max": 3}


def test_restart_control_netcdf_export(tmp_path):
    """L_RESTART_NETCDF writes a reference-format NetCDF restart next to
    the exact .npz, and it round-trips through the reference importer."""
    model, st, prm, frc = _build()
    rc = rst.RestartControl(str(tmp_path / "r"), ndt_per_restart=0,
                            num_timesteps=2, dto=1200.0, start_days=0.0,
                            netcdf_grid=(4, 1))
    st2 = model.step(st, prm, frc, first_step=True)
    rc.maybe_write(2, st2, prm, frc)
    rc.flush()                      # async by default: wait for the writer
    ncs = [p for p in rc.written if p.endswith(".nc")]
    npzs = [p for p in rc.written if p.endswith(".npz")]
    assert len(ncs) == 1 and len(npzs) == 1
    st_in, prm_in, t = rst.import_reference_restart(ncs[0], st, prm,
                                                    grid=model.grid)
    np.testing.assert_allclose(np.asarray(st_in.x), np.asarray(st2.x),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st_in.us), np.asarray(st2.us),
                               rtol=1e-12)
    assert np.array_equal(np.asarray(st_in.old), np.asarray(st2.old))


def test_output_files_carry_domain_axes(tmp_path):
    """Diagnostic files carry the rectilinear domain longitude/latitude
    coordinate variables with CF attributes (the XIOS domain definition,
    mckpp_xios_io.F90:48-57)."""
    model, st, prm, frc = _build()
    lons = np.asarray([100.0, 100.5, 101.0, 101.5])
    s = diag.Stream("dom", "instant", 1, fields=("T", "hmix"))
    dm = diag.DiagnosticsManager([s], nx=4, ny=1, zm=model.grid.zm,
                                 outdir=str(tmp_path), dto_seconds=1200.0,
                                 async_write=False,
                                 lons=lons, lats=np.asarray([-5.0]))
    dm.step(1, st, prm, frc)
    dm.flush()
    from scipy.io import netcdf_file
    with netcdf_file(str(tmp_path / "dom.nc"), "r", mmap=False) as nc:
        np.testing.assert_array_equal(nc.variables["longitude"][:], lons)
        np.testing.assert_array_equal(nc.variables["latitude"][:], [-5.0])
        assert nc.variables["longitude"].units == b"degrees_east"
        assert nc.variables["latitude"].standard_name == b"latitude"
