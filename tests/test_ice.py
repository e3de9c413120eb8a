"""Sea-ice ancillary subsystem tests.

Reference: mckpp_read_ice_mod.F90:57-118 (iceconc + optional icedepth /
snowdepth on the ndtupdice cadence), the boundary-update dispatcher branch
(mckpp_boundary_update_mod.F90:50-56), the initial read
(mckpp_initialize_fields_mod.F90:70-71), and the SST read's zeroing of
iceconc/usf/vsf when the ice / surface-current climatologies are off
(mckpp_read_sst_mod.F90:88-96).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from mckpp_tpu.config import KppConfig, DomainConfig, TimeConfig
from mckpp_tpu.io.ancillaries import BoundaryManager
from mckpp_tpu.io import ncio
from mckpp_tpu.state import init_forcing

NX, NY, NZ = 4, 2, 8
NPTS = NX * NY
DTSEC, NDTOCN = 3600.0, 3
DTO = DTSEC / NDTOCN


def _times(ndt, n=40):
    period = ndt * DTO / 86400.0
    return (np.arange(n) + 0.5) * period


def write_ice(path, ndt=3, with_depth=False):
    times = _times(ndt)
    lons = np.arange(NX, dtype=float)
    lats = np.arange(NY, dtype=float)
    ice = np.clip(np.linspace(0, 0.9, NPTS).reshape(NY, NX)[None]
                  + 0.001 * times[:, None, None], 0, 1)
    fields = {"iceconc": (("t", "latitude", "longitude"), ice)}
    if with_depth:
        fields["icedepth"] = (("t", "latitude", "longitude"), 2.0 * ice)
        fields["snowdepth"] = (("t", "latitude", "longitude"), 0.1 * ice)
    ncio.write_fields(path, {"t": len(times), "latitude": NY, "longitude": NX},
                      {"t": ("t", times), "latitude": ("latitude", lats),
                       "longitude": ("longitude", lons)}, fields)
    return ice


def write_sst(path, ndt=3):
    times = _times(ndt)
    lons = np.arange(NX, dtype=float)
    lats = np.arange(NY, dtype=float)
    sst = 290.0 + np.zeros((len(times), NY, NX))     # Kelvin (autoconvert)
    ncio.write_fields(path, {"t": len(times), "latitude": NY, "longitude": NX},
                      {"t": ("t", times), "latitude": ("latitude", lats),
                       "longitude": ("longitude", lons)},
                      {"sst": (("t", "latitude", "longitude"), sst)})


def _cfg(tmp_path, **boundary):
    cfg = KppConfig(domain=DomainConfig(nx=NX, ny=NY, nz=NZ, dmax=100.0),
                    time=TimeConfig(dtsec=DTSEC, ndtocn=NDTOCN))
    return cfg.replace(boundary=dataclasses.replace(cfg.boundary, **boundary))


def test_initial_ice_read_and_cadence(tmp_path):
    ice_path = str(tmp_path / "ice.nc")
    ice = write_ice(ice_path, with_depth=True)
    cfg = _cfg(tmp_path, l_climice=True, l_upd_climice=True, ndtupdice=3,
               ice_file=ice_path, l_clim_ice_depth=True,
               l_clim_snow_on_ice=True)
    mgr = BoundaryManager(cfg, 0.0, 0.0, NZ + 1, np.zeros(NPTS))
    frc = init_forcing(NPTS, NZ + 1)
    frc = mgr.initial_reads(0.0, frc)
    np.testing.assert_allclose(np.asarray(frc.iceconc),
                               ice[0].reshape(-1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(frc.icedepth),
                               2.0 * ice[0].reshape(-1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(frc.snowdepth),
                               0.1 * ice[0].reshape(-1), rtol=1e-12)

    # cadence: fires at (ntime-1) % ndtupdice == 0; record index advances
    nt = 4
    frc2 = mgr.update(nt, (nt - 1) * DTO / 86400.0, frc)
    np.testing.assert_allclose(np.asarray(frc2.iceconc),
                               ice[1].reshape(-1), rtol=1e-12)
    # off-cadence step leaves the field untouched
    frc3 = mgr.update(nt + 1, nt * DTO / 86400.0, frc2)
    np.testing.assert_allclose(np.asarray(frc3.iceconc),
                               np.asarray(frc2.iceconc))


def test_sst_read_zeroes_ice_and_currents_when_off(tmp_path):
    sst_path = str(tmp_path / "sst.nc")
    write_sst(sst_path)
    cfg = _cfg(tmp_path, l_climsst=True, ndtupdsst=3, sst_file=sst_path,
               l_climice=False, l_climcurr=False)
    mgr = BoundaryManager(cfg, 0.0, 0.0, NZ + 1, np.zeros(NPTS))
    frc = init_forcing(NPTS, NZ + 1)
    frc = dataclasses.replace(frc,
                              iceconc=jnp.full((NPTS,), 0.5),
                              usf=jnp.full((NPTS,), 0.1),
                              vsf=jnp.full((NPTS,), -0.1))
    frc = mgr.initial_reads(0.0, frc)
    # Kelvin autoconversion applied
    np.testing.assert_allclose(np.asarray(frc.sst0), 290.0 - 273.15,
                               rtol=1e-12)
    assert np.all(np.asarray(frc.iceconc) == 0.0)
    assert np.all(np.asarray(frc.usf) == 0.0)
    assert np.all(np.asarray(frc.vsf) == 0.0)


def test_sst_read_preserves_ice_when_climice_on(tmp_path):
    sst_path = str(tmp_path / "sst.nc")
    ice_path = str(tmp_path / "ice.nc")
    write_sst(sst_path)
    ice = write_ice(ice_path)
    cfg = _cfg(tmp_path, l_climsst=True, ndtupdsst=3, sst_file=sst_path,
               l_climice=True, ndtupdice=3, ice_file=ice_path)
    mgr = BoundaryManager(cfg, 0.0, 0.0, NZ + 1, np.zeros(NPTS))
    frc = init_forcing(NPTS, NZ + 1)
    frc = mgr.initial_reads(0.0, frc)
    np.testing.assert_allclose(np.asarray(frc.iceconc),
                               ice[0].reshape(-1), rtol=1e-12)
