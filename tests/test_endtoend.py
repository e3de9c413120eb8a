"""End-to-end CLI test: reference-format namelist + synthetic NetCDF inputs
-> full run with file forcing, ancillary updates, diagnostics and restarts
(the TerraMaris-style workflow of SURVEY.md section 4 at toy scale)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from mckpp_tpu.io import ncio
from mckpp_tpu.utils import namelist as nml

pytestmark = pytest.mark.slow

NX, NY, NZ = 4, 3, 10
DMAX = 100.0
SPD = 86400.0
DTSEC = 3600.0
NDTOCN = 3


def write_inputs(d, sst=False, advect=False):
    lons = 90.0 + 0.5 * np.arange(NX)
    lats = -5.0 + 0.5 * np.arange(NY)
    # land-sea mask: one land point
    lsm = np.zeros((NY, NX))
    lsm[0, 0] = 1.0
    depth = np.full((NY, NX), -1000.0)
    ncio.write_fields(
        str(d / "lsm.nc"),
        {"longitude": NX, "latitude": NY},
        {"longitude": ("longitude", lons), "latitude": ("latitude", lats)},
        {"lsm": (("latitude", "longitude"), lsm),
         "max_depth": (("latitude", "longitude"), depth)})

    # vertical grid (uniform, but via the file path)
    h = np.full(NZ, DMAX / NZ)
    zf = -(np.cumsum(h) - 0.5 * h)
    dd = np.cumsum(h)
    ncio.write_fields(str(d / "vgrid.nc"), {"z": NZ},
                      {"z": ("z", zf)},
                      {"d": (("z",), dd), "h": (("z",), h)})

    # initial conditions on their own z-grids
    zin = -np.asarray([1.0, 20.0, 50.0, 120.0])
    t_in = 25.0 + 8.0 * (1.0 - np.exp(-zin / 60.0))      # warm surface
    t_prof = np.tile(t_in[:, None, None], (1, NY, NX))
    s_prof = np.tile((35.0 + 0.01 * np.abs(zin))[:, None, None], (1, NY, NX))
    uv = np.zeros((len(zin), NY, NX))
    ncio.write_fields(
        str(d / "init.nc"),
        {"zvel": len(zin), "ztemp": len(zin), "zsal": len(zin),
         "longitude": NX, "latitude": NY},
        {"zvel": ("zvel", zin), "ztemp": ("ztemp", zin), "zsal": ("zsal", zin),
         "longitude": ("longitude", lons), "latitude": ("latitude", lats)},
        {"u": (("zvel", "latitude", "longitude"), uv),
         "v": (("zvel", "latitude", "longitude"), uv),
         "temp": (("ztemp", "latitude", "longitude"), t_prof),
         "sal": (("zsal", "latitude", "longitude"), s_prof)})

    # forcing fluxes on the ndtocn cadence (time at window centres)
    ntimes = 30
    ftimes = (np.arange(ntimes) + 0.5) * DTSEC / SPD
    shp = (ntimes, NY, NX)
    ncio.write_fields(
        str(d / "fluxes.nc"),
        {"time": ntimes, "longitude": NX, "latitude": NY},
        {"time": ("time", ftimes),
         "longitude": ("longitude", lons), "latitude": ("latitude", lats)},
        {"taux": (("time", "latitude", "longitude"), np.full(shp, 0.05)),
         "tauy": (("time", "latitude", "longitude"), np.zeros(shp)),
         "swf": (("time", "latitude", "longitude"), np.full(shp, 220.0)),
         "lwf": (("time", "latitude", "longitude"), np.full(shp, -50.0)),
         "lhf": (("time", "latitude", "longitude"), np.full(shp, -110.0)),
         "shf": (("time", "latitude", "longitude"), np.full(shp, -10.0)),
         "precip": (("time", "latitude", "longitude"), np.full(shp, 5e-5))})

    # optics: jerlov water types
    ncio.write_fields(
        str(d / "paras.nc"),
        {"longitude": NX, "latitude": NY},
        {"longitude": ("longitude", lons), "latitude": ("latitude", lats)},
        {"jerlov": (("latitude", "longitude"), np.full((NY, NX), 3.0))})

    couple_extra = ""
    advec_extra = ""
    advect_decl = "L_ADVECT=.F.,"
    if advect:
        # per-column steady advection corrections (reference file shape:
        # mckpp_initialize_advection_mod.F90:14-69) — salt modes vary by
        # column; temperature modes present but ignored by the physics
        maxadv = 6
        nmode_s = np.zeros((NY, NX)); nmode_s.flat[:3] = [1, 2, 1]
        mode_s = np.zeros((maxadv, NY, NX)); adv_s = np.zeros((maxadv, NY, NX))
        mode_s[0].flat[:3] = [1, 2, 5]
        mode_s[1].flat[1] = 3
        adv_s[0].flat[:3] = [2.0e-6, 1.5e-6, 1.0e-6]
        adv_s[1].flat[1] = -1.0e-6
        nmode_t = np.ones((NY, NX))
        mode_t = np.zeros((maxadv, NY, NX)); mode_t[0, :, :] = 3
        adv_t = np.zeros((maxadv, NY, NX)); adv_t[0, :, :] = 50.0
        ncio.write_fields(
            str(d / "advect.nc"),
            {"mode": maxadv, "longitude": NX, "latitude": NY},
            {"longitude": ("longitude", lons), "latitude": ("latitude", lats)},
            {"nmode_tadv": (("latitude", "longitude"), nmode_t),
             "nmode_sadv": (("latitude", "longitude"), nmode_s),
             "mode_tadv": (("mode", "latitude", "longitude"), mode_t),
             "mode_sadv": (("mode", "latitude", "longitude"), mode_s),
             "tadv": (("mode", "latitude", "longitude"), adv_t),
             "sadv": (("mode", "latitude", "longitude"), adv_s)})
        advect_decl = "L_ADVECT=.T., advect_file='advect.nc',"
    if sst:
        # SST climatology on the ndtupdsst cadence (times at window centres)
        nsst = 30
        stimes = (np.arange(nsst) + 0.5) * (3 * DTSEC / NDTOCN) / SPD
        sst_data = (24.0 + np.linspace(0, 1, NY * NX).reshape(NY, NX)
                    [None, :, :] + 0.1 * stimes[:, None, None])
        ncio.write_fields(
            str(d / "sst.nc"),
            {"t": nsst, "longitude": NX, "latitude": NY},
            {"t": ("t", stimes),
             "longitude": ("longitude", lons), "latitude": ("latitude", lats)},
            {"sst": (("t", "latitude", "longitude"), sst_data)})
        couple_extra = (" L_CLIMSST=.T., L_UPD_CLIMSST=.T., "
                        "sstin_file='sst.nc', ndtupdsst=3,")
        advec_extra = " L_RELAX_SST=.T., relax_sst_in=2.0,2.0,2.0,"

    namelist = f"""
 &NAME_PARAMETERS
 nz={NZ}, nx={NX}, ny={NY}, ngrid={NZ}, nztmax={NZ+14},
 nx_globe={NX}, ny_globe={NY}
 &END
 &NAME_CONSTANTS &END
 &NAME_PROCSWIT &END
 &NAME_DOMAIN
 dmax={DMAX}, L_REGGRID=.F., L_VGRID_FILE=.T., vgrid_file='vgrid.nc',
 alon=90.0, alat=-5.0
 &END
 &NAME_LANDSEA
 L_LANDSEA=.T., landsea_file='lsm.nc'
 &END
 &NAME_START
 L_INITDATA=.T., initdata_file='init.nc', L_RESTART=.F., L_INTERPINIT=.T.
 &END
 &NAME_TIMES
 dtsec={DTSEC}, startt=0.0, finalt=0.25, ndtocn={NDTOCN}
 &END
 &NAME_COUPLE L_COUPLE=.F.,{couple_extra} &END
 &NAME_ADVEC {advect_decl}{advec_extra} &END
 &NAME_PARAS
 paras_file='paras.nc', L_JERLOV=.T.
 &END
 &NAME_FORCING
 L_FLUXDATA=.T., forcing_file='fluxes.nc'
 &END
 &NAME_OUTPUT
 L_RESTARTW=.T., restart_outfile='restart_out', ndt_per_restart=9
 &END
"""
    (d / "3D_ocn.nml").write_text(namelist)


def test_namelist_ingests_reference_file():
    """Our parser must ingest the reference's actual TerraMaris namelist."""
    with open("/root/reference/run/3D_ocn.nml") as f:
        cfg, extras = nml.config_from_namelist(f.read())
    assert cfg.domain.nx == 453 and cfg.domain.ny == 319
    assert cfg.domain.nz == 69
    assert cfg.domain.l_vgrid_file and cfg.domain.vgrid_file == "kpp_vgrid.nc"
    assert cfg.time.dtsec == 3600.0 and cfg.time.ndtocn == 3
    assert cfg.time.startt == 304.0 and cfg.time.finalt == 305.0
    assert cfg.time.dto == 1200.0
    assert cfg.time.num_timesteps == 72          # one model day
    assert cfg.forcing.l_fluxdata
    assert cfg.forcing.forcing_file == "fluxes.nc"
    assert not cfg.boundary.l_relax_sst
    assert cfg.output.ndt_per_restart == 72
    assert cfg.init.paras_file == "aqua_paras.nc" and not cfg.init.l_jerlov


def test_cli_full_run(tmp_path):
    write_inputs(tmp_path)
    out = tmp_path / "out"
    out.mkdir()
    from mckpp_tpu import cli
    rc = cli.main(["--namelist", str(tmp_path / "3D_ocn.nml"),
                   "--data-dir", str(tmp_path),
                   "--output-dir", str(out),
                   "--steps", "9"])
    assert rc == 0
    # diagnostics written
    inst = out / "kpp_1h_inst.nc"
    assert inst.exists()
    with ncio.open_nc(str(inst)) as nc:
        t = ncio.get_var(nc, "T")
        hmix = ncio.get_var(nc, "hmix")
    assert t.shape == (3, NZ + 1, NY, NX)        # 9 steps / every 3
    assert np.all(np.isfinite(t))
    # land column (y=0,x=0) keeps its initial surface temperature
    assert hmix.shape == (3, NY, NX)
    # restart written at step 9
    rs = list(out.glob("restart_out_*.npz"))
    assert rs, "no restart written"


def test_cli_multi_device(tmp_path):
    write_inputs(tmp_path)
    out = tmp_path / "out8"
    out.mkdir()
    from mckpp_tpu import cli
    rc = cli.main(["--namelist", str(tmp_path / "3D_ocn.nml"),
                   "--data-dir", str(tmp_path),
                   "--output-dir", str(out),
                   "--steps", "3", "--multi-device"])
    assert rc == 0
    assert (out / "kpp_1h_inst.nc").exists()


def test_cli_multi_device_with_ancillaries(tmp_path):
    """Multi-device run WITH per-step SST-climatology updates + SST
    relaxation: the BoundaryManager must produce padded/sharded arrays so
    the ancillary cadence can fire mid-run (round-1 bug: shape mismatch).
    The 8-device trajectory must match the single-device one."""
    write_inputs(tmp_path, sst=True)
    from mckpp_tpu import cli
    out1 = tmp_path / "out1"
    out8 = tmp_path / "out8"
    out1.mkdir()
    out8.mkdir()
    rc = cli.main(["--namelist", str(tmp_path / "3D_ocn.nml"),
                   "--data-dir", str(tmp_path),
                   "--output-dir", str(out1), "--steps", "9"])
    assert rc == 0
    rc = cli.main(["--namelist", str(tmp_path / "3D_ocn.nml"),
                   "--data-dir", str(tmp_path),
                   "--output-dir", str(out8),
                   "--steps", "9", "--multi-device"])
    assert rc == 0
    with ncio.open_nc(str(out1 / "kpp_1h_inst.nc")) as nc:
        t1 = ncio.get_var(nc, "T")
        f1 = ncio.get_var(nc, "fcorr")
    with ncio.open_nc(str(out8 / "kpp_1h_inst.nc")) as nc:
        t8 = ncio.get_var(nc, "T")
        f8 = ncio.get_var(nc, "fcorr")
    np.testing.assert_allclose(t8, t1, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(f8, f1, rtol=1e-12, atol=1e-9)
    # relaxation must actually be active (non-vacuous): fcorr nonzero on sea
    assert np.any(f1 != 0.0), "SST relaxation produced no flux correction"


def test_cli_advecting_run_ingests_advect_file(tmp_path):
    """File-driven advection through the full stack: the namelist's
    NAME_ADVEC group + advect file (reference shape,
    mckpp_initialize_advection_mod.F90:14-69) load into per-column
    rhsmod parameters, the production FUSED path accepts the config
    (supports_fused since r4), and the salinity trajectory responds while
    a no-advection twin does not."""
    import dataclasses
    import jax.numpy as jnp
    from mckpp_tpu.utils import namelist as nml2
    from mckpp_tpu import setup as setup_mod

    write_inputs(tmp_path, advect=True)
    cfg, _ = nml2.load_config(str(tmp_path / "3D_ocn.nml"))
    assert cfg.boundary.l_advect
    model, st, prm, frc, flux_provider, mgr = setup_mod.build(
        cfg, str(tmp_path))
    assert model.pass_impl in ("fused_xla", "pallas"), model.pass_impl
    # the file's per-column salt modes landed in the params
    nm = np.asarray(prm.nmodeadv)
    md = np.asarray(prm.modeadv)
    ad = np.asarray(prm.advection)
    assert list(nm[:3, 1]) == [1, 2, 1]
    assert md[0, 0, 1] == 1 and md[1, 0, 1] == 2 and md[1, 1, 1] == 3
    np.testing.assert_allclose(ad[1, 0, 1], 1.5e-6)
    # run a few steps; compare against an l_advect=False twin
    cfg0 = cfg.replace(boundary=dataclasses.replace(
        cfg.boundary, l_advect=False))
    model0, st0, prm0, frc0, _, _ = setup_mod.build(cfg0, str(tmp_path))
    from mckpp_tpu import forcing as forcing_mod
    for nt in range(1, 4):
        if (nt - 1) % cfg.time.ndtocn == 0:
            raw = flux_provider((nt - 1) * cfg.time.dto / 86400.0)
            st, frc = forcing_mod.update_fluxes(
                cfg, st, prm, frc, raw, jnp.asarray(nt <= 1), model.grid.dm)
            st0, frc0 = forcing_mod.update_fluxes(
                cfg0, st0, prm0, frc0, raw, jnp.asarray(nt <= 1),
                model0.grid.dm)
        st = model.step(st, prm, frc, first_step=(nt <= 1))
        st0 = model0.step(st0, prm0, frc0, first_step=(nt <= 1))
    ds = np.abs(np.asarray(st.x[..., 1]) - np.asarray(st0.x[..., 1]))
    wet = np.asarray(prm.run_physics)
    assert ds[wet].max() > 1e-10          # advection moved salinity...
    adv_free = (nm[:, 1] == 0) & wet
    if adv_free.any():                    # ...only where modes are set
        assert ds[adv_free].max() < 1e-14
