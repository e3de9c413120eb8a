"""Ancillary/forcing file readers + boundary-condition update manager.

Host-side replacement for the reference's per-field reader modules
(mckpp_read_*.F90) and the boundary-update dispatcher
(mckpp_boundary_update_mod.F90:24-124), with the reference's update-time
semantics (mckpp_time_control.F90:71-167):

* method 1: read-time = time + half the update period;
* method 2: floor-quantized read-time (used by the 3-D T/S climatologies
  and the 2-D corrections);
* periodic climatology wrap (subtract the period until within the file);
* abort unless the record exists within 0.01*dtsec tolerance.

Each reader lazily resolves the model domain's (lon, lat) offsets inside
the ancillary grid on first use and caches the file's time axis, exactly as
the reference's ``initialize_*`` routines do.  Fields are returned as
flattened ``(npts,)`` / ``(npts, nzp1)`` arrays matching the model layout
(``ipt = (j-1)*nx + i``).

Per-reader quirks preserved: SST/bottom-temperature Kelvin autoconversion;
salinity climatology has Sref removed; 3-D temperature validates the file's
level count; methods per reader match the reference call sites.
"""

from __future__ import annotations

import dataclasses
import math
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .. import constants as c
from ..config import KppConfig
from ..state import Forcing, ColumnParams
from .. import forcing as forcing_mod
from . import ncio

SPD = c.SPD      # default; get_update_time takes the run's spd


def _nint(x: float) -> int:
    """Fortran NINT: round half away from zero (Python's round() banks)."""
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def get_update_time(time: float, ndt_update: int, file_times: np.ndarray,
                    periodic: bool, period: int, dto: float, dtsec: float,
                    method: int = 1, spd: float = c.SPD):
    """Compute (update_time, 0-based record index); abort if absent.

    Mirrors mckpp_get_update_time (mckpp_time_control.F90:71-167):

    * method 1 read-time = time + half the update period (:131-140);
    * method 2 = floor-quantized integer arithmetic (:142-154);
    * periodic wrap subtracts the period while beyond the last record
      (:96-103); there is deliberately NO low-side wrap (the reference has
      none — negative positions abort, as get_update_pos would index off
      the front of the axis);
    * the record index is the reference's position arithmetic
      NINT((t - first)/upd) (:157-167) — evaluated on the WRAPPED
      update_time, because the reference evaluates it on the raw model
      time, which for wrapped periodic reads indexes past the end of the
      axis and dies under bounds checking; the wrapped time is the only
      well-defined extension.  Non-uniform axes fall back to a
      nearest-match, and either way the result must match a file record
      within 0.01*dtsec (:115-122) or we abort.
    """
    upd_days = ndt_update * dto / spd
    if method == 2:
        # integer-arithmetic quantization (mckpp_time_control.F90:142-154)
        q = (math.floor(time) * round(spd)) // (ndt_update * round(dto))
        update_time = upd_days * q + 0.5 * dto / spd * ndt_update
    else:
        update_time = time + 0.5 * upd_days

    tol = 0.01 * dtsec / spd
    # the wrap compare carries the validity tolerance: a read-time that is
    # one float ulp above the last record must not wrap a whole period
    # (the reference's strict > has the same intent in exact arithmetic)
    if update_time > file_times[-1] + tol:
        if not periodic:
            raise ncio.NetCDFError(
                f"time to read {update_time} exceeds the last time in the "
                "file and periodic reads have not been specified")
        while update_time > file_times[-1] + tol:
            update_time -= period
    pos = _nint((update_time - file_times[0]) / upd_days)
    if not (0 <= pos < len(file_times)
            and abs(file_times[pos] - update_time) <= tol):
        near = int(np.argmin(np.abs(file_times - update_time)))
        if abs(file_times[near] - update_time) > tol:
            raise ncio.NetCDFError(
                f"cannot find time {update_time} in ancillary file "
                f"(closest {file_times[near]})")
        pos = near
    return update_time, pos


class AncillaryReader:
    """Lazy-initialized reader for one ancillary file."""

    def __init__(self, path: str, lon0: float, lat0: float,
                 nx: int, ny: int, time_name: str = "t"):
        self.path = path
        self.lon0, self.lat0 = lon0, lat0
        self.nx, self.ny = nx, ny
        self.time_name = time_name
        self._init = False
        self.offsets = (0, 0)
        self.file_times: Optional[np.ndarray] = None
        self.nz_in: Optional[int] = None
        # prefetch cache: {(kind, var, pos): host array}, filled by a
        # background prefetcher ahead of the ancillary cadence and consumed
        # (popped) by the synchronous read — the host-side analog of the
        # "prefetch on the ancillary cadence" reader in SURVEY §2.6.
        self._cache: dict = {}
        self._cache_lock = threading.Lock()
        self.cache_hits = 0

    def _initialize(self, nc):
        self.offsets = ncio.determine_boundaries(nc, self.lon0, self.lat0)
        self.file_times = ncio.get_time_axis(nc, (self.time_name, "time", "t"))
        if "z" in nc.variables:
            self.nz_in = len(nc.variables["z"][:])
        self._init = True

    def _yspan(self, rows):
        """Flat row range [lo, hi) -> (y0, y1, trim-slice) in domain rows.

        Host-local reads (multi-host: each process reads only its slab of
        columns, the MPI-decomposition analog of SURVEY §2.6) fetch the
        covering y rows and trim to the exact flat range."""
        lo, hi = rows
        if hi <= lo:
            return 0, 0, slice(0, 0)
        y0, y1 = lo // self.nx, (hi - 1) // self.nx + 1
        return y0, y1, slice(lo - y0 * self.nx, hi - y0 * self.nx)

    def _read2d_uncached(self, var: str, pos: int, rows=None) -> np.ndarray:
        with ncio.open_nc(self.path) as nc:
            if not self._init:
                self._initialize(nc)
            olon, olat = self.offsets
            y0, y1, trim = (0, self.ny, slice(None)) if rows is None \
                else self._yspan(rows)
            data = ncio.get_var(nc, var,
                                index=(pos,
                                       slice(olat + y0, olat + y1),
                                       slice(olon, olon + self.nx)))
        return data.reshape(-1)[trim]

    def read2d(self, var: str, pos: int, rows=None) -> np.ndarray:
        """(npts,) slab at time index pos (file layout (t, y, x));
        ``rows=(lo, hi)`` reads only that flat-index range."""
        with self._cache_lock:
            hit = self._cache.pop(("2d", var, pos, rows), None)
        if hit is not None:
            self.cache_hits += 1
            return hit
        return self._read2d_uncached(var, pos, rows)

    def _read3d_uncached(self, var: str, pos: int, nzp1: int,
                         rows=None) -> np.ndarray:
        with ncio.open_nc(self.path) as nc:
            if not self._init:
                self._initialize(nc)
            olon, olat = self.offsets
            y0, y1, trim = (0, self.ny, slice(None)) if rows is None \
                else self._yspan(rows)
            data = ncio.get_var(nc, var,
                                index=(pos, slice(None),
                                       slice(olat + y0, olat + y1),
                                       slice(olon, olon + self.nx)))
        nz_in = data.shape[0]
        if nz_in != nzp1:
            raise ncio.NetCDFError(
                f"{self.path}:{var} has {nz_in} levels, expected {nzp1}")
        return np.moveaxis(data, 0, -1).reshape(-1, nzp1)[trim]

    def read3d(self, var: str, pos: int, nzp1: int, rows=None) -> np.ndarray:
        """(npts, nzp1) slab at time index pos (file layout (t, z, y, x));
        ``rows=(lo, hi)`` reads only that flat-index range."""
        with self._cache_lock:
            hit = self._cache.pop(("3d", var, pos, nzp1, rows), None)
        if hit is not None:
            self.cache_hits += 1
            return hit
        return self._read3d_uncached(var, pos, nzp1, rows)

    def prefetch(self, kind: str, var: str, pos: int,
                 nzp1: Optional[int] = None, rows=None) -> None:
        """Read a slab into the cache (runs on the prefetcher thread).
        The cached bytes are exactly what the synchronous read would
        produce, so consuming them cannot change results."""
        key = (("2d", var, pos, rows) if kind == "2d"
               else ("3d", var, pos, nzp1, rows))
        with self._cache_lock:
            if key in self._cache:
                return
        data = (self._read2d_uncached(var, pos, rows) if kind == "2d"
                else self._read3d_uncached(var, pos, nzp1, rows))
        with self._cache_lock:
            # bound the cache: one (newest) entry per (kind, var).  If a
            # prefetch loses the race with the synchronous read (short
            # cadences), the stale entry would otherwise never be consumed
            # and host memory would grow by a record per missed race.
            for k in [k for k in self._cache if k[:2] == (kind, var)]:
                del self._cache[k]
            self._cache[key] = data

    def times(self) -> np.ndarray:
        if not self._init:
            with ncio.open_nc(self.path) as nc:
                self._initialize(nc)
        return self.file_times


class FluxFileReader:
    """Forcing-file reader (mckpp_read_fluxes_mod.F90): taux, tauy, swf,
    lwf, lhf, shf, precip at the ndtocn cadence; snow = 0.

    With a ColumnLayout attached (multi-host), each process reads only its
    own slab of rows and feeds only its own devices — the fluxes are the
    most frequent ancillary read (every ndtocn steps), so host-local reads
    matter most here."""

    def __init__(self, cfg: KppConfig, lon0: float, lat0: float):
        d = cfg.domain
        self.cfg = cfg
        self.npts = d.nx * d.ny
        self.layout = None
        self.rd = AncillaryReader(cfg.forcing.forcing_file, lon0, lat0,
                                  d.nx, d.ny, time_name="time")

    def set_layout(self, layout) -> None:
        self.layout = layout

    def __call__(self, time_days: float) -> forcing_mod.RawFluxes:
        t = self.cfg.time
        _, pos = get_update_time(time_days, t.ndtocn, self.rd.times(),
                                 False, 0, t.dto, t.dtsec, method=1)
        if self.layout is None:
            g = lambda v: jnp.asarray(self.rd.read2d(v, pos))
        else:
            lo, hi = self.layout.local_rows(self.npts)
            want = self.layout.hi - self.layout.lo

            def g(v):
                a = self.rd.read2d(v, pos, (lo, hi))
                if a.shape[0] < want:
                    a = np.pad(a, (0, want - a.shape[0]))
                return self.layout.global_array(a, local=True)
        taux = g("taux")
        return forcing_mod.RawFluxes(
            taux=taux, tauy=g("tauy"), swf=g("swf"), lwf=g("lwf"),
            lhf=g("lhf"), shf=g("shf"), rain=g("precip"),
            snow=jnp.zeros_like(taux))


class BoundaryManager:
    """Applies the per-field ancillary cadences each step
    (mckpp_boundary_update_mod.F90) and the initial reads
    (mckpp_initialize_fields_mod.F90:70-118)."""

    def __init__(self, cfg: KppConfig, lon0: float, lat0: float,
                 nzp1: int, sref: np.ndarray, prefetch: bool = True):
        self.cfg = cfg
        self.nzp1 = nzp1
        self.sref = np.asarray(sref)
        # column layout for padded/sharded runs (set by set_layout): every
        # array entering Forcing is padded to the device multiple and placed
        # with the column sharding, so ancillary refreshes keep the Forcing
        # pytree shape- and sharding-consistent under multi-device/multi-host
        # execution (each host feeds only its own devices).
        self.layout = None
        d, f, b = cfg.domain, cfg.forcing, cfg.boundary
        mk = lambda path: AncillaryReader(path, lon0, lat0, d.nx, d.ny)
        self.sst = mk(b.sst_file) if b.l_climsst or b.l_upd_climsst else None
        self.ice = mk(b.ice_file) if b.l_climice or b.l_upd_climice else None
        self.fcorr = mk(f.fcorr_file) if (f.l_fcorr or f.l_fcorr_withz) else None
        self.sfcorr = mk(f.sfcorr_file) if (f.l_sfcorr or f.l_sfcorr_withz) else None
        self.bottom = mk(f.bottom_file) if f.l_vary_bottom_temp else None
        need_ocnt = (b.l_relax_ocnt or f.l_upd_ocnt or f.l_no_isotherm)
        need_sal = (b.l_relax_sal or f.l_upd_sal or f.l_no_isotherm)
        self.ocnt = mk(f.ocnt_file) if need_ocnt else None
        self.sal = mk(f.sal_file) if need_sal else None
        # async prefetcher: after each dispatcher pass, the next record due
        # on every active cadence is read ahead on a background thread so
        # the step loop's synchronous read is a cache hit (SURVEY §2.6:
        # "prefetch on the ancillary cadence").  Determinism is preserved:
        # the cache is keyed by (var, record-index) and holds exactly the
        # bytes the synchronous read would produce.
        self.prefetch_enabled = prefetch
        self._prefetch_pool: Optional[ThreadPoolExecutor] = None
        self._prefetch_futs: list = []

    def set_layout(self, layout) -> None:
        """Attach a parallel.distributed.ColumnLayout (or None).  With a
        layout, every ancillary read fetches only this process's slab of
        rows (host-local reads — the per-rank block an MPI decomposition
        would own, SURVEY §2.6) and feeds only this host's devices."""
        self.layout = layout

    def _rows(self):
        """This process's flat row range [lo, hi) clamped to the unpadded
        domain; None when no layout is attached (read the whole domain)."""
        if self.layout is None:
            return None
        return self.layout.local_rows(self.npts)

    @property
    def npts(self) -> int:
        return self.cfg.domain.nx * self.cfg.domain.ny

    def _pad_local(self, arr: np.ndarray) -> np.ndarray:
        """Zero-pad a local slab up to the layout's padded slab width
        (rows beyond the domain are padding columns)."""
        want = self.layout.hi - self.layout.lo
        if arr.shape[0] == want:
            return arr
        return np.pad(arr, [(0, want - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1))

    def _get2d(self, reader, var, pos):
        rows = self._rows()
        if rows is None:
            return reader.read2d(var, pos)
        return self._pad_local(reader.read2d(var, pos, rows))

    def _get3d(self, reader, var, pos):
        rows = self._rows()
        if rows is None:
            return reader.read3d(var, pos, self.nzp1)
        return self._pad_local(reader.read3d(var, pos, self.nzp1, rows))

    def _local_sref(self) -> np.ndarray:
        """Sref rows matching what _get3d returned (full domain, or this
        process's zero-padded slab)."""
        rows = self._rows()
        if rows is None:
            return self.sref
        return self._pad_local(self.sref[rows[0]:rows[1]])

    def _kelvin(self, a: np.ndarray) -> np.ndarray:
        """Kelvin autoconversion with the detection made domain-global
        (the reference evaluates ANY() over the whole domain,
        mckpp_read_sst_mod.F90:84-88; a host-local slab must not decide
        differently from its peers)."""
        from ..parallel.distributed import any_across_processes
        local = bool(np.any((a > 200.0) & (a < 400.0)))
        if any_across_processes(local):
            return a - self.cfg.constants.tk0
        return a

    def _dev(self, arr):
        """Host array -> device array honoring the column layout.  With a
        layout attached, reads are host-local slabs (see _get2d/_get3d)."""
        if self.layout is None:
            return jnp.asarray(arr)
        return self.layout.global_array(np.asarray(arr), local=True)

    # ---- individual reads -------------------------------------------------
    def _upd(self, reader, ndt, periodic, period, method):
        t = self.cfg.time
        return get_update_time(self._time, ndt, reader.times(), periodic,
                               period, t.dto, t.dtsec, method=method,
                               spd=self.cfg.constants.spd)

    def read_sst(self, frc: Forcing) -> Forcing:
        f, b = self.cfg.forcing, self.cfg.boundary
        _, pos = self._upd(self.sst, b.ndtupdsst, b.l_periodic_climsst,
                           b.climsst_period, 1)
        sst = self._kelvin(self._get2d(self.sst, "sst", pos))
        # uncoupled: SST0 is the (ifirst=jfirst=1) slice = the whole domain
        # (mckpp_physics_overrides_sst0)
        frc = dataclasses.replace(frc, sst0=self._dev(sst))
        # the SST read zeroes ice/surface-current climatologies when their
        # own readers are off (mckpp_read_sst_mod.F90:88-96)
        if not b.l_climice:
            frc = dataclasses.replace(frc, iceconc=jnp.zeros_like(frc.iceconc))
        if not b.l_climcurr:
            frc = dataclasses.replace(frc, usf=jnp.zeros_like(frc.usf),
                                      vsf=jnp.zeros_like(frc.vsf))
        return frc

    def read_ice(self, frc: Forcing) -> Forcing:
        """Climatological sea-ice concentration (+ optional depth/snow)
        on the ndtupdice cadence (mckpp_read_ice_mod.F90:57-118)."""
        b = self.cfg.boundary
        _, pos = self._upd(self.ice, b.ndtupdice, b.l_periodic_climice,
                           b.climice_period, 1)
        frc = dataclasses.replace(
            frc, iceconc=self._dev(self._get2d(self.ice, "iceconc", pos)))
        if b.l_clim_ice_depth:
            frc = dataclasses.replace(
                frc, icedepth=self._dev(self._get2d(self.ice, "icedepth", pos)))
        if b.l_clim_snow_on_ice:
            frc = dataclasses.replace(
                frc, snowdepth=self._dev(self._get2d(self.ice, "snowdepth", pos)))
        return frc

    def read_fcorr(self, frc: Forcing) -> Forcing:
        f = self.cfg.forcing
        if f.l_fcorr_withz:
            _, pos = self._upd(self.fcorr, f.ndtupdfcorr, f.l_periodic_fcorr,
                               f.fcorr_period, 1)
            fz = self._get3d(self.fcorr, "fcorr", pos)
            return dataclasses.replace(frc, fcorr_withz=self._dev(fz))
        _, pos = self._upd(self.fcorr, f.ndtupdfcorr, f.l_periodic_fcorr,
                           f.fcorr_period, 2)
        f2 = self._get2d(self.fcorr, "fcorr", pos)
        return dataclasses.replace(frc, fcorr_twod=self._dev(f2))

    def read_sfcorr(self, frc: Forcing) -> Forcing:
        f = self.cfg.forcing
        if f.l_sfcorr_withz:
            _, pos = self._upd(self.sfcorr, f.ndtupdsfcorr,
                               f.l_periodic_sfcorr, f.sfcorr_period, 1)
            sz = self._get3d(self.sfcorr, "sfcorr", pos)
            return dataclasses.replace(frc, sfcorr_withz=self._dev(sz))
        _, pos = self._upd(self.sfcorr, f.ndtupdsfcorr, f.l_periodic_sfcorr,
                           f.sfcorr_period, 2)
        s2 = self._get2d(self.sfcorr, "sfcorr", pos)
        return dataclasses.replace(frc, sfcorr_twod=self._dev(s2))

    def read_bottom(self, frc: Forcing) -> Forcing:
        f = self.cfg.forcing
        _, pos = self._upd(self.bottom, f.ndtupdbottom,
                           f.l_periodic_bottom_temp, f.bottom_temp_period, 1)
        bt = self._kelvin(self._get2d(self.bottom, "T", pos))
        return dataclasses.replace(frc, bottom_temp=self._dev(bt))

    def read_ocnt(self, frc: Forcing, at_time: Optional[float] = None) -> Forcing:
        f = self.cfg.forcing
        saved = self._time
        if at_time is not None:
            self._time = at_time
        try:
            _, pos = self._upd(self.ocnt, f.ndtupdocnt, f.l_periodic_ocnt,
                               f.ocnt_period, 2)
        finally:
            self._time = saved
        t3 = self._get3d(self.ocnt, "temperature", pos)
        return dataclasses.replace(frc, ocnt_clim=self._dev(t3))

    def read_sal(self, frc: Forcing, at_time: Optional[float] = None) -> Forcing:
        f = self.cfg.forcing
        saved = self._time
        if at_time is not None:
            self._time = at_time
        try:
            _, pos = self._upd(self.sal, f.ndtupdsal, f.l_periodic_sal,
                               f.sal_period, 2)
        finally:
            self._time = saved
        s3 = self._get3d(self.sal, "salinity", pos) \
            - self._local_sref()[:, None]
        return dataclasses.replace(frc, sal_clim=self._dev(s3))

    # ---- time interpolation (mckpp_boundary_interpolate.F90) -------------
    def _interp(self, frc, read_fn, ndt_upd, period, field):
        true_time = int(self._time)
        nd = ndt_upd * self.cfg.time.dto / self.cfg.constants.spd
        prev_time = int(math.floor((true_time + nd / 2) / nd) * nd - nd * 0.5)
        if prev_time < 0:
            prev_weight = (nd - abs(true_time - prev_time)) / nd
            prev_time = prev_time + period
        else:
            prev_weight = (nd - (true_time - prev_time)) / nd
        next_time = prev_time + nd
        next_weight = 1.0 - prev_weight
        # device-side blend: reads are already padded/sharded by _dev, so
        # the weighted sum stays shard-local (works multi-host too)
        prev = getattr(read_fn(frc, at_time=prev_time), field)
        nxt = getattr(read_fn(frc, at_time=next_time), field)
        blend = nxt * next_weight + prev * prev_weight
        return dataclasses.replace(frc, **{field: blend})

    def interp_ocnt(self, frc: Forcing) -> Forcing:
        f = self.cfg.forcing
        return self._interp(frc, self.read_ocnt, f.ndtupdocnt,
                            f.ocnt_period, "ocnt_clim")

    def interp_sal(self, frc: Forcing) -> Forcing:
        f = self.cfg.forcing
        return self._interp(frc, self.read_sal, f.ndtupdsal,
                            f.sal_period, "sal_clim")

    # ---- initialization-time reads (initialize_fields) -------------------
    def initial_reads(self, time_days: float, frc: Forcing) -> Forcing:
        self._time = time_days
        cfg = self.cfg
        f, b = cfg.forcing, cfg.boundary
        if b.l_climsst:
            frc = self.read_sst(frc)
        if b.l_climice:
            frc = self.read_ice(frc)
        if f.l_fcorr_withz or f.l_fcorr:
            frc = self.read_fcorr(frc)
        if f.l_sfcorr_withz or f.l_sfcorr:
            frc = self.read_sfcorr(frc)
        if f.l_vary_bottom_temp:
            frc = self.read_bottom(frc)
        if b.l_relax_ocnt:
            frc = self.interp_ocnt(frc) if f.l_interp_ocnt else self.read_ocnt(frc)
        if b.l_relax_sal:
            frc = self.interp_sal(frc) if f.l_interp_sal else self.read_sal(frc)
        if f.l_no_isotherm and not b.l_relax_sal and not b.l_relax_ocnt:
            frc = self.read_ocnt(frc)
            frc = self.read_sal(frc)
        if self.prefetch_enabled:
            self.schedule_prefetch(1, time_days)
        return frc

    def due_any(self, ntime: int) -> bool:
        """Whether :meth:`update` would refresh ANY field at step ntime —
        the step-chaining boundary predicate (models/chain.py): steps
        where this is False are pure state->state and may run inside a
        chained dispatch without calling update() at all."""
        cfg = self.cfg
        f, b = cfg.forcing, cfg.boundary

        def due(ndt):
            return (ntime - 1) % ndt == 0

        return bool(
            (b.l_upd_climsst and due(b.ndtupdsst))
            or (b.l_upd_climice and due(b.ndtupdice))
            or (f.l_upd_fcorr and due(f.ndtupdfcorr)
                and (f.l_fcorr_withz or f.l_fcorr))
            or (f.l_upd_sfcorr and due(f.ndtupdsfcorr)
                and (f.l_sfcorr_withz or f.l_sfcorr))
            or (f.l_upd_bottom_temp and due(f.ndtupdbottom))
            or (f.l_upd_sal and not f.l_interp_sal and due(f.ndtupdsal))
            or (f.l_upd_sal and f.l_interp_sal and due(f.ndt_interp_sal))
            or (f.l_upd_ocnt and not f.l_interp_ocnt and due(f.ndtupdocnt))
            or (f.l_upd_ocnt and f.l_interp_ocnt
                and due(f.ndt_interp_ocnt)))

    # ---- per-step dispatcher (mckpp_boundary_update_mod.F90:24-124) ------
    def update(self, ntime: int, time_days: float, frc: Forcing) -> Forcing:
        cfg = self.cfg
        f, b = cfg.forcing, cfg.boundary
        self._time = time_days

        def due(ndt):
            return (ntime - 1) % ndt == 0

        if b.l_upd_climsst and due(b.ndtupdsst):
            frc = self.read_sst(frc)
        if b.l_upd_climice and due(b.ndtupdice):
            frc = self.read_ice(frc)
        if f.l_upd_fcorr and due(f.ndtupdfcorr) and (f.l_fcorr_withz or f.l_fcorr):
            frc = self.read_fcorr(frc)
        if f.l_upd_sfcorr and due(f.ndtupdsfcorr) and (f.l_sfcorr_withz or f.l_sfcorr):
            frc = self.read_sfcorr(frc)
        if f.l_upd_bottom_temp and due(f.ndtupdbottom):
            frc = self.read_bottom(frc)
        if f.l_upd_sal and not f.l_interp_sal and due(f.ndtupdsal):
            frc = self.read_sal(frc)
        elif f.l_upd_sal and f.l_interp_sal and due(f.ndt_interp_sal):
            frc = self.interp_sal(frc)
        if f.l_upd_ocnt and not f.l_interp_ocnt and due(f.ndtupdocnt):
            frc = self.read_ocnt(frc)
        elif f.l_upd_ocnt and f.l_interp_ocnt and due(f.ndt_interp_ocnt):
            frc = self.interp_ocnt(frc)
        if self.prefetch_enabled:
            self.schedule_prefetch(ntime, time_days)
        return frc

    # ---- cadence-ahead prefetch ------------------------------------------
    def _prefetch_jobs(self, ntime: int, time_days: float):
        """(reader, kind, var, ndt, periodic, period, method, time') for
        every ancillary whose next cadence firing can be read ahead
        (time-interpolated fields are excluded: their bracketing records
        are cheap repeat reads)."""
        f, b, t = self.cfg.forcing, self.cfg.boundary, self.cfg.time
        table = []
        if b.l_upd_climsst:
            table.append((self.sst, "2d", "sst", b.ndtupdsst,
                          b.l_periodic_climsst, b.climsst_period, 1))
        if b.l_upd_climice:
            vars_ = ["iceconc"]
            if b.l_clim_ice_depth:
                vars_.append("icedepth")
            if b.l_clim_snow_on_ice:
                vars_.append("snowdepth")
            for v in vars_:
                table.append((self.ice, "2d", v, b.ndtupdice,
                              b.l_periodic_climice, b.climice_period, 1))
        if f.l_upd_fcorr and f.l_fcorr_withz:
            table.append((self.fcorr, "3d", "fcorr", f.ndtupdfcorr,
                          f.l_periodic_fcorr, f.fcorr_period, 1))
        elif f.l_upd_fcorr and f.l_fcorr:
            table.append((self.fcorr, "2d", "fcorr", f.ndtupdfcorr,
                          f.l_periodic_fcorr, f.fcorr_period, 2))
        if f.l_upd_sfcorr and f.l_sfcorr_withz:
            table.append((self.sfcorr, "3d", "sfcorr", f.ndtupdsfcorr,
                          f.l_periodic_sfcorr, f.sfcorr_period, 1))
        elif f.l_upd_sfcorr and f.l_sfcorr:
            table.append((self.sfcorr, "2d", "sfcorr", f.ndtupdsfcorr,
                          f.l_periodic_sfcorr, f.sfcorr_period, 2))
        if f.l_upd_bottom_temp:
            table.append((self.bottom, "2d", "T", f.ndtupdbottom,
                          f.l_periodic_bottom_temp, f.bottom_temp_period, 1))
        if f.l_upd_sal and not f.l_interp_sal:
            table.append((self.sal, "3d", "salinity", f.ndtupdsal,
                          f.l_periodic_sal, f.sal_period, 2))
        if f.l_upd_ocnt and not f.l_interp_ocnt:
            table.append((self.ocnt, "3d", "temperature", f.ndtupdocnt,
                          f.l_periodic_ocnt, f.ocnt_period, 2))
        jobs = []
        for reader, kind, var, ndt, periodic, period, method in table:
            # next step n' > ntime with (n'-1) % ndt == 0
            n_next = ((ntime - 1) // ndt + 1) * ndt + 1
            t_next = time_days + (n_next - ntime) * t.dto \
                / self.cfg.constants.spd
            jobs.append((reader, kind, var, ndt, periodic, period,
                         method, t_next))
        return jobs

    def schedule_prefetch(self, ntime: int, time_days: float) -> None:
        """Queue background reads of each active ancillary's next record."""
        jobs = self._prefetch_jobs(ntime, time_days)
        if not jobs:
            return
        if self._prefetch_pool is None:
            self._prefetch_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ancprefetch")
        t = self.cfg.time

        rows = self._rows()

        def run(reader, kind, var, ndt, periodic, period, method, when):
            try:
                _, pos = get_update_time(when, ndt, reader.times(), periodic,
                                         period, t.dto, t.dtsec, method=method)
                reader.prefetch(kind, var, pos,
                                self.nzp1 if kind == "3d" else None,
                                rows=rows)
            except Exception:
                # the synchronous read raises the real, contextful error
                pass

        self._prefetch_futs = [f for f in self._prefetch_futs if not f.done()]
        for job in jobs:
            self._prefetch_futs.append(self._prefetch_pool.submit(run, *job))

    def drain_prefetch(self) -> None:
        """Wait for queued prefetch reads (test/shutdown hook)."""
        for f in self._prefetch_futs:
            f.result()
        self._prefetch_futs = []
