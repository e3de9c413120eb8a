"""Cadence-ahead ancillary prefetch (SURVEY §2.6: host-side reader
"prefetch on the ancillary cadence").

The prefetcher must be a pure latency optimization: the forcing produced
with prefetch on is identical to prefetch off, and the read that fires on
the next cadence is served from the cache."""

import dataclasses

import numpy as np

from mckpp_tpu.config import KppConfig, DomainConfig, TimeConfig
from mckpp_tpu.io.ancillaries import BoundaryManager
from mckpp_tpu.io import ncio
from mckpp_tpu.state import init_forcing

NX, NY, NZ = 4, 2, 6
NPTS = NX * NY
DTSEC, NDTOCN = 3600.0, 3
DTO = DTSEC / NDTOCN


def write_sst(path, ndt=3, n=60):
    period = ndt * DTO / 86400.0
    times = (np.arange(n) + 0.5) * period
    sst = (290.0 + np.arange(n)[:, None, None]
           + np.arange(NPTS).reshape(NY, NX)[None] * 0.01)
    ncio.write_fields(
        path, {"t": n, "latitude": NY, "longitude": NX},
        {"t": ("t", times),
         "latitude": ("latitude", np.arange(NY, dtype=float)),
         "longitude": ("longitude", np.arange(NX, dtype=float))},
        {"sst": (("t", "latitude", "longitude"), sst)})


def _cfg(sst_path):
    cfg = KppConfig(domain=DomainConfig(nx=NX, ny=NY, nz=NZ, dmax=100.0),
                    time=TimeConfig(dtsec=DTSEC, ndtocn=NDTOCN))
    return cfg.replace(boundary=dataclasses.replace(
        cfg.boundary, l_climsst=True, l_upd_climsst=True, ndtupdsst=3,
        sst_file=sst_path))


def _run(mgr, nsteps=13):
    frc = init_forcing(NPTS, NZ + 1)
    frc = mgr.initial_reads(0.0, frc)
    out = [np.asarray(frc.sst0)]
    for nt in range(2, nsteps + 1):
        t = (nt - 1) * DTO / 86400.0
        frc = mgr.update(nt, t, frc)
        out.append(np.asarray(frc.sst0))
    return out


def test_prefetch_hits_and_preserves_results(tmp_path):
    path = str(tmp_path / "sst.nc")
    write_sst(path)
    cfg = _cfg(path)

    mgr_on = BoundaryManager(cfg, 0.0, 0.0, NZ + 1, np.zeros(NPTS),
                             prefetch=True)
    mgr_off = BoundaryManager(cfg, 0.0, 0.0, NZ + 1,
                              np.zeros(NPTS), prefetch=False)

    frc = init_forcing(NPTS, NZ + 1)
    frc = mgr_on.initial_reads(0.0, frc)
    mgr_on.drain_prefetch()
    # the record for the next cadence firing is already cached
    assert len(mgr_on.sst._cache) == 1

    on = _run(BoundaryManager(cfg, 0.0, 0.0, NZ + 1, np.zeros(NPTS),
                              prefetch=True))
    off = _run(mgr_off)
    for a, b in zip(on, off):
        np.testing.assert_array_equal(a, b)


def test_prefetched_record_is_consumed(tmp_path):
    path = str(tmp_path / "sst.nc")
    write_sst(path)
    mgr = BoundaryManager(_cfg(path), 0.0, 0.0, NZ + 1, np.zeros(NPTS),
                          prefetch=True)
    frc = init_forcing(NPTS, NZ + 1)
    frc = mgr.initial_reads(0.0, frc)
    mgr.drain_prefetch()
    # cadence ndtupdsst=3 fires at nt = 4 ((nt-1) % 3 == 0)
    frc = mgr.update(4, 3 * DTO / 86400.0, frc)
    assert mgr.sst.cache_hits == 1
    assert ("2d", "sst", 1) not in mgr.sst._cache  # popped on use
