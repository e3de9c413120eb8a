"""XIOS-equivalent diagnostics engine: per-step field extraction, on-device
temporal reductions (instant / average / minimum / maximum), and periodic
NetCDF flushes.

Replaces the reference's XIOS output path (mckpp_xios_io.F90:74-210 +
run/iodef.xml streams).  The 35 diagnostic fields (23 depth-varying + 12
single-level) are reproduced with the reference's exact staggering:
salinity gets Sref added back; difm/dift/difs/dbloc are shifted one level
down with a zero surface value.

Accumulation happens on device under jit (one fused update per step);
flushing gathers to host and appends to per-stream NetCDF files — the
async-host-flush equivalent of XIOS's temporal reductions + file output.
"""

from __future__ import annotations

import dataclasses
import os
import threading
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..state import State, ColumnParams, Forcing
from . import ncio

DEPTH_FIELDS = ("u", "v", "T", "S", "B", "wu", "wv", "wT", "wS", "wB",
                "wTnt", "difm", "dift", "difs", "rho", "cp", "scorr", "Rig",
                "dbloc", "Shsq", "tinc_fcorr", "fcorr_z", "sinc_fcorr")
SURFACE_FIELDS = ("hmix", "fcorr", "taux_in", "tauy_in", "solar_in",
                  "nsolar_in", "PminusE_in", "cplwght", "freeze_flag",
                  "comp_flag", "dampu_flag", "dampv_flag")


def extract_fields(st: State, prm: ColumnParams, frc: Forcing) -> Dict[str, jax.Array]:
    """Build the diagnostic field dict from the model state
    (reference: mckpp_xios_diagnostic_output, mckpp_xios_io.F90:86-208).

    Depth-varying fields are (ncol, nzp1); single-level are (ncol,).
    """
    nzp1 = st.u.shape[-2]
    nz = nzp1 - 1
    zero_col = jnp.zeros(st.hmix.shape + (1,), st.u.dtype)

    def shift_down(interface_arr):
        # reference: level 1 = 0, levels 2..NZP1 = dif(1..NZ)
        return jnp.concatenate([zero_col, interface_arr[..., 1:nz + 1]], axis=-1)

    out = {
        "u": st.u[..., 0], "v": st.u[..., 1],
        "T": st.x[..., 0],
        "S": st.x[..., 1] + prm.sref[..., None],
        "B": st.buoy,
        "wu": st.wu[..., 0], "wv": st.wu[..., 1],
        "wT": st.wx[..., 0], "wS": st.wx[..., 1], "wB": st.wx[..., 2],
        "wTnt": st.wxnt[..., 0],
        "difm": shift_down(st.difm), "dift": shift_down(st.dift),
        "difs": shift_down(st.difs),
        "rho": st.rho, "cp": st.cp,
        "scorr": st.scorr,
        "Rig": jnp.concatenate([st.rig[..., 1:], zero_col], axis=-1),
        "dbloc": jnp.concatenate([zero_col, st.dbloc[..., 1:]], axis=-1),
        "Shsq": jnp.concatenate([st.shsq[..., 1:], zero_col], axis=-1),
        "tinc_fcorr": st.tinc_fcorr,
        "fcorr_z": st.ocntcorr,
        "sinc_fcorr": st.sinc_fcorr,
        "hmix": st.hmix, "fcorr": st.fcorr,
        "taux_in": frc.sflux[..., 0], "tauy_in": frc.sflux[..., 1],
        "solar_in": frc.sflux[..., 2], "nsolar_in": frc.sflux[..., 3],
        "PminusE_in": frc.sflux[..., 5],
        "cplwght": prm.cplwght,
        "freeze_flag": st.freeze_flag,
        "comp_flag": st.reset_flag,     # reference outputs reset_flag as comp_flag
        "dampu_flag": st.dampu_flag, "dampv_flag": st.dampv_flag,
    }
    return out


FILL_VALUE = 1.0e20          # XIOS/netCDF default fill for masked points

# fields that require the step's diagnostic-materialization pass (the wide
# outputs of ops/ocnstep_fused.py's final full pass).  Everything else is
# prognostic or refreshed every step elsewhere (state u/x/hmix, override
# flags,
# forcing inputs) and is valid even when the step ran with_diags=False.
WIDE_FIELDS = frozenset({
    "B", "wu", "wv", "wT", "wS", "wB", "wTnt", "difm", "dift", "difs",
    "rho", "cp", "scorr", "Rig", "dbloc", "Shsq", "tinc_fcorr", "fcorr_z",
    "sinc_fcorr", "fcorr"})


@dataclasses.dataclass
class Stream:
    """One output stream: fields x reduction x frequency (an iodef.xml
    <file> element equivalent).  ``split_freq_days`` reproduces XIOS's
    split_freq (run/iodef.xml:88: daily file splitting): when set, each
    split window is written to its own ``<name>_<start-day>.nc`` as soon
    as the window closes, bounding host memory to one window's records.

    ``entries`` supports the full iodef <field> form — (output name,
    source field, operation) triples, so one file can mix operations and
    rename fields (e.g. T -> T_inst, run/iodef.xml:92).  When unset,
    ``fields`` x ``reduction`` applies to every field uniformly."""
    name: str
    reduction: str                    # instant | average | minimum | maximum
    freq: int                         # output every `freq` ocean steps
    fields: Tuple[str, ...] = DEPTH_FIELDS + SURFACE_FIELDS
    split_freq_days: Optional[float] = None
    entries: Optional[Tuple[Tuple[str, str, str], ...]] = None

    def resolved_entries(self) -> Tuple[Tuple[str, str, str], ...]:
        if self.entries is not None:
            return self.entries
        return tuple((f, f, self.reduction) for f in self.fields)


class DiagnosticsManager:
    """Accumulates temporal reductions on device; emitted records stream to
    per-split NetCDF files as each split window closes (the XIOS-equivalent
    output path: on-device reduction -> host flush on cadence -> daily file
    split -> land masking via the output-domain mask,
    mckpp_xios_io.F90:35-210 + run/iodef.xml:88-157)."""

    def __init__(self, streams: List[Stream], nx: int, ny: int, zm,
                 outdir: str = ".", start_time_days: float = 0.0,
                 dto_seconds: float = 0.0, l_ocean=None,
                 async_write: bool = True, write_mode: str = "single",
                 lons=None, lats=None):
        """``write_mode``: "single" gathers every emitted window to process
        0, the lone writer (XIOS one_file); "shard" has EACH process write
        its own row slab to ``<stream>[_<split>]_p<rank>.nc`` with no
        cross-host transfer at all (XIOS multiple_file,
        run/iodef.xml:88 type= attribute) — merge afterwards with
        :func:`merge_shard_files`.  At pod scale "shard" removes the
        process-0 gather+encode funnel from the critical path."""
        if write_mode not in ("single", "shard"):
            raise ValueError(f"write_mode {write_mode!r}")
        self.write_mode = write_mode
        self.emit_gathers = 0         # cross-host allgathers performed on
                                      # emit (stays 0 in shard mode; tests
                                      # and the CLI report it)
        self.streams = streams
        self.nx, self.ny = nx, ny
        self.zm = np.asarray(zm)
        # rectilinear domain axes (the XIOS domain lon/lat,
        # mckpp_xios_io.F90:48-57); optional — written as coordinate
        # variables when provided
        self.lons = None if lons is None else np.asarray(lons, np.float64)
        self.lats = None if lats is None else np.asarray(lats, np.float64)
        self.outdir = outdir
        self.start = start_time_days
        self.dto_days = dto_seconds / 86400.0
        # output-domain land mask (reference mask_1d, mckpp_xios_io.F90:58):
        # land columns are written as FILL_VALUE
        self.mask = None if l_ocean is None else ~np.asarray(l_ocean)
        # ColumnLayout for sharded/multi-host runs (set_layout): step()
        # then accumulates directly on the sharded device arrays (the
        # reductions are elementwise, so they commute with the column
        # sharding) and the host gather happens ONLY when a window emits —
        # zero cross-host transfers on non-emitting steps (the
        # XIOS-detached-server analog, run/iodef.xml:88)
        self.layout = None
        self._accum: Dict[str, Optional[Dict[str, jax.Array]]] = {
            s.name: None for s in streams}
        self._count: Dict[str, int] = {s.name: 0 for s in streams}
        self._records: Dict[str, List[Tuple[float, Dict[str, np.ndarray]]]] = {
            s.name: [] for s in streams}
        self._split_idx: Dict[str, int] = {s.name: 0 for s in streams}
        self.paths: Dict[str, str] = {}
        # async writer: the device->host fetch + NetCDF encode of a closed
        # split window runs on a background thread, overlapping the next
        # window's device compute (the XIOS-server analog of detached I/O)
        self._writer = ThreadPoolExecutor(max_workers=1) if async_write \
            else None
        self._pending = []
        self._plock = threading.Lock()
        # bound on emitted-but-unfetched window BYTES (device-buffer
        # lifetime): a 648k-column all-diags window is ~2.4 GB, so the
        # cap must be by volume, not count
        import collections
        self._inflight = collections.deque()     # (future, nbytes)
        self._inflight_bytes = 0
        self._max_pending_mb = float(
            os.environ.get("MCKPP_DIAG_MAX_PENDING_MB", "512"))

        @partial(jax.jit, static_argnames=("ops",))
        def _update(accum, fields, ops):
            fns = {"average": jnp.add, "minimum": jnp.minimum,
                   "maximum": jnp.maximum}
            opmap = dict(ops)
            return {k: v if opmap[k] not in fns else fns[opmap[k]](accum[k], v)
                    for k, v in fields.items()}
        self._update_fn = _update

        # jit the extraction, restricted to the fields actually sampled
        # this step (static name tuple -> XLA dead-code-eliminates the
        # rest; most steps only the reduced scalars T/S/hmix are needed,
        # not all 35 wide fields).  Jitting also means outputs are fresh
        # buffers, so accumulators never alias a step-donated input
        # buffer (the sharded step donates its state argument).
        @partial(jax.jit, static_argnames=("names",))
        def _extract_subset(st, prm, frc, names):
            fields = extract_fields(st, prm, frc)
            return {k: fields[k] for k in names}
        self._extract_fn = _extract_subset

    def set_layout(self, layout) -> None:
        """Attach a parallel.distributed.ColumnLayout: step() may then be
        fed the sharded (padded) trees directly."""
        self.layout = layout

    def needs_full(self, nt: int) -> bool:
        """Whether step ``nt`` must run with full diagnostic
        materialization: true when any stream samples a WIDE field this
        step — reducing (mean/min/max) entries sample every step, instant
        entries only on their emit step.  Drives the model's
        ``with_diags`` static flag (ops/ocnstep_fused.py)."""
        for s in self.streams:
            emit = nt % s.freq == 0
            for _, src, op in s.resolved_entries():
                if src in WIDE_FIELDS and (op != "instant" or emit):
                    return True
        return False

    def step(self, nt: int, st: State, prm: ColumnParams, frc: Forcing):
        # union of source fields any stream samples THIS step: reducing
        # entries every step, instant entries only on their emit step
        needed = set()
        for s in self.streams:
            emit = nt % s.freq == 0
            for _, src, op in s.resolved_entries():
                if op != "instant" or emit:
                    needed.add(src)
        if not needed:
            return
        fields = self._extract_fn(st, prm, frc,
                                  names=tuple(sorted(needed)))
        for s in self.streams:
            ents = s.resolved_entries()
            red = tuple(e for e in ents if e[2] != "instant")
            inst = tuple(e for e in ents if e[2] == "instant")
            emit = nt % s.freq == 0
            if not red and not emit:
                continue
            if red:
                sub = {out: fields[src] for out, src, _ in red}
                if self._accum[s.name] is None:
                    self._accum[s.name] = sub
                    self._count[s.name] = 1
                else:
                    ops = tuple((out, op) for out, _, op in red)
                    self._accum[s.name] = self._update_fn(
                        self._accum[s.name], sub, ops)
                    self._count[s.name] += 1
            if emit:
                self._emit(s, nt,
                           {out: fields[src] for out, src, _ in inst})

    def _emit(self, s: Stream, nt: int, instant_fields=None):
        acc = dict(self._accum[s.name] or {})
        if instant_fields:
            acc.update(instant_fields)
        cnt = self._count[s.name]
        if self.layout is not None and jax.process_count() > 1 \
                and self.write_mode == "single":
            # multi-host single-writer: the cross-host allgather is a
            # collective and must not race the step loop's collectives
            # from the writer thread — gather synchronously, once per
            # emitted window.  (shard mode never gathers: each process
            # fetches only its own device shards, on the writer thread.)
            acc = {k: self.layout.gather(v) for k, v in acc.items()}
            self.emit_gathers += len(acc)
        # single-process: keep device arrays; the writer thread fetches
        # them (layout-aware in _materialize), overlapping the
        # device->host transfer with subsequent compute
        t = self.start + nt * self.dto_days
        # close the current split window first if this record starts a new
        # one (record time stamps the END of its reduction window, so the
        # window index uses a small backward nudge)
        if s.split_freq_days:
            k = int((t - self.start - 1e-9) // s.split_freq_days)
            if self._records[s.name] and k != self._split_idx[s.name]:
                self._write_split(s)
            self._split_idx[s.name] = k
        ops = {out: op for out, _, op in s.resolved_entries()}
        packed = (acc, cnt, ops)
        if self._writer is not None:
            # materialize EAGERLY on the writer thread: the device->host
            # fetch of this window overlaps subsequent compute instead of
            # piling up at flush (with daily splits every window of the
            # day would otherwise fetch at exit), and the device buffers
            # free as soon as the copy lands — holding a whole day of
            # records in HBM OOMs large configs (648k-column ensemble).
            # Backpressure: bound the in-flight (emitted-but-unfetched)
            # window bytes — when the step loop outruns the host link, it
            # blocks here (the XIOS client behaves the same when its
            # server buffer fills) instead of accumulating device
            # buffers until OOM.
            nbytes = sum(int(getattr(v, "nbytes", 0))
                         for v in acc.values())
            cap = self._max_pending_mb * 1e6
            while self._inflight and \
                    self._inflight_bytes + nbytes > cap:
                fut0, nb0 = self._inflight.popleft()
                fut0.result()
                self._inflight_bytes -= nb0
            packed = self._writer.submit(self._materialize, packed)
            self._inflight.append((packed, nbytes))
            self._inflight_bytes += nbytes
        self._records[s.name].append((t, packed))
        self._accum[s.name] = None
        self._count[s.name] = 0

    def _shard_rows(self):
        """This process's [lo, hi) of the unpadded domain (shard mode)."""
        npts = self.nx * self.ny
        if self.layout is None:
            return 0, npts
        return self.layout.local_rows(npts)

    def _materialize(self, packed):
        acc, cnt, ops = packed
        sharded = self.write_mode == "shard" and self.layout is not None
        mask = self.mask
        if sharded and mask is not None:
            lo_u, hi_u = self._shard_rows()
            mask = mask[lo_u:hi_u]
        rec = {}
        for k, v in acc.items():
            if sharded and isinstance(v, jax.Array):
                a = self.layout.local_shard(v)   # own shards only, no
                                                 # collective
            elif self.layout is not None and isinstance(v, jax.Array):
                a = self.layout.gather(v)      # unpads; 1-process fetch
            else:
                a = np.asarray(v)
            if ops[k] == "average":
                a = a / cnt
            if mask is not None:
                a = a.copy()
                a[mask, ...] = FILL_VALUE
            rec[k] = a
        return rec

    def _write_split(self, s: Stream):
        """Hand the stream's buffered records to the writer (async when
        enabled) and drop them from the buffer."""
        recs = self._records[s.name]
        if not recs:
            return None
        self._records[s.name] = []
        split_idx = self._split_idx[s.name]
        if self.write_mode == "single" and self.layout is not None \
                and jax.process_count() > 1 and jax.process_index() != 0:
            return None            # single writer: process 0 owns the files
        if self._writer is not None:
            self._pending.append(
                self._writer.submit(self._encode, s, recs, split_idx))
        else:
            self._encode(s, recs, split_idx)

    def _encode(self, s: Stream, recs, split_idx):
        # resolve eagerly-materialized windows (their futures were queued
        # on this same single writer thread BEFORE this encode job, so
        # they are already complete — FIFO, no deadlock)
        from concurrent.futures import Future
        recs = [(t, p.result() if isinstance(p, Future)
                 else self._materialize(p)) for t, p in recs]
        times = [t for t, _ in recs]
        nt = len(recs)
        nzp1 = len(self.zm)
        sharded = self.write_mode == "shard" and self.layout is not None
        shard_suffix = ""
        attrs = {"reduction": s.reduction.encode(),
                 "fill_value": FILL_VALUE}
        if sharded:
            # per-process slab on a flat "points" dim (the XIOS
            # multiple_file layout): rows [lo, hi) of the flattened
            # (y, x) domain, recorded as attrs for merge_shard_files
            lo_u, hi_u = self._shard_rows()
            rank = jax.process_index()
            shard_suffix = f"_p{rank}"
            dims = {"time": nt, "z": nzp1, "points": hi_u - lo_u}
            attrs.update(shard_lo=lo_u, shard_hi=hi_u,
                         shard_nx=self.nx, shard_ny=self.ny,
                         shard_rank=rank,
                         shard_count=jax.process_count())
        else:
            dims = {"time": nt, "z": nzp1, "y": self.ny, "x": self.nx}
        coords = {"time": ("time", times), "z": ("z", self.zm)}
        if self.lons is not None and self.lats is not None:
            # domain axes ride every file (shard files carry the FULL
            # axes — small — so each is self-describing and the merge
            # passes them through)
            if sharded:
                dims["x"] = self.nx
                dims["y"] = self.ny
            coords["longitude"] = ("x", self.lons)
            coords["latitude"] = ("y", self.lats)
        fields = {}
        for name in recs[0][1]:
            sample = recs[0][1][name]
            arr = np.stack([r[name] for _, r in recs])
            if sharded:
                if sample.ndim == 2:      # (rows, nzp1)
                    fields[name] = (("time", "z", "points"),
                                    np.moveaxis(arr, -1, 1))
                else:
                    fields[name] = (("time", "points"), arr)
            elif sample.ndim == 2:        # (ncol, nzp1)
                arr = arr.reshape(nt, self.ny, self.nx, nzp1)
                arr = np.moveaxis(arr, -1, 1)
                fields[name] = (("time", "z", "y", "x"), arr)
            else:
                fields[name] = (("time", "y", "x"),
                                arr.reshape(nt, self.ny, self.nx))
        if s.split_freq_days:
            split_start = self.start + split_idx * s.split_freq_days
            fname = f"{s.name}_{split_start:09.3f}{shard_suffix}.nc"
        else:
            fname = f"{s.name}{shard_suffix}.nc"
        path = os.path.join(self.outdir, fname)
        os.makedirs(self.outdir, exist_ok=True)
        # self-describing time metadata: XIOS stamps a Gregorian calendar
        # with origin 0000-01-01 + (day-counter + 1) days
        # (mckpp_xios_io.F90:41,63); "days since 0000-01-02" makes a CF
        # decode of our raw day-counter values land on the same dates.
        var_attrs = {
            "time": {"units": "days since 0000-01-02 00:00:00",
                     "calendar": "gregorian", "axis": "T",
                     "standard_name": "time"},
            "z": {"units": "m", "positive": "up", "axis": "Z",
                  "long_name": "depth of model levels"},
        }
        if "longitude" in coords:
            var_attrs["longitude"] = {"units": "degrees_east", "axis": "X",
                                      "standard_name": "longitude"}
            var_attrs["latitude"] = {"units": "degrees_north", "axis": "Y",
                                     "standard_name": "latitude"}
        if self.mask is not None:
            for name in fields:
                var_attrs[name] = {"_FillValue": FILL_VALUE}
        ncio.write_fields(path, dims, coords, fields, attrs=attrs,
                          var_attrs=var_attrs)
        with self._plock:
            self.paths[fname if s.split_freq_days else s.name] = path
        return path

    def flush(self):
        """Write any remaining buffered records, wait for the async
        writer to drain; returns all paths written over the run."""
        for s in self.streams:
            self._write_split(s)
        for fut in self._pending:
            fut.result()
        self._pending = []
        return self.paths


def merge_shard_files(shard_paths, out_path: str) -> str:
    """Reassemble per-process shard files (``<stream>[_<split>]_pN.nc``,
    written by ``write_mode='shard'``) into the single-writer
    ``(time, z, y, x)`` layout — the offline half of the XIOS
    multiple_file workflow.  Values are byte-identical to what the
    single-writer path would have produced: the temporal reductions are
    per-column, so concatenating row slabs loses nothing."""
    from scipy.io import netcdf_file

    def iattr(nc, name):        # attrs may round-trip as float or array
        return int(np.asarray(getattr(nc, name)).ravel()[0])

    ncs = [netcdf_file(str(p), "r", mmap=False) for p in shard_paths]
    try:
        ncs.sort(key=lambda nc: iattr(nc, "shard_lo"))
        head = ncs[0]
        nx, ny = iattr(head, "shard_nx"), iattr(head, "shard_ny")
        npts = nx * ny
        covered = sorted((iattr(nc, "shard_lo"), iattr(nc, "shard_hi"))
                         for nc in ncs)
        pos = 0
        for lo, hi in covered:
            if lo != pos:
                raise ValueError(f"shard files do not tile the domain: gap "
                                 f"at rows [{pos}, {lo})")
            pos = hi
        if pos != npts:
            raise ValueError(f"shard files cover rows [0, {pos}) of {npts}")
        times = np.asarray(head.variables["time"][:], np.float64).copy()
        zvals = np.asarray(head.variables["z"][:], np.float64).copy()
        nt, nzp1 = len(times), len(zvals)
        dims = {"time": nt, "z": nzp1, "y": ny, "x": nx}
        coords = {"time": ("time", times), "z": ("z", zvals)}

        def var_attrs_of(v):
            return {k: val for k, val in v._attributes.items()}

        var_attrs = {"time": var_attrs_of(head.variables["time"]),
                     "z": var_attrs_of(head.variables["z"])}
        # domain coordinate axes (full in every shard) pass straight through
        for axis, dim in (("longitude", "x"), ("latitude", "y")):
            if axis in head.variables:
                v = head.variables[axis]
                coords[axis] = (dim, np.asarray(v[:], np.float64).copy())
                var_attrs[axis] = var_attrs_of(v)
        fields = {}
        for name, v in head.variables.items():
            if name in ("time", "z", "longitude", "latitude"):
                continue
            depth = v.data.ndim == 3
            shape = (nt, nzp1, npts) if depth else (nt, npts)
            # preserve the shards' on-disk precision (f32 diagnostics
            # stay f32 in the merged file)
            dt = np.float32 if v.data.dtype == np.float32 else np.float64
            full = np.empty(shape, dt)
            for nc in ncs:
                lo, hi = iattr(nc, "shard_lo"), iattr(nc, "shard_hi")
                full[..., lo:hi] = nc.variables[name][:]
            if depth:
                fields[name] = (("time", "z", "y", "x"),
                                full.reshape(nt, nzp1, ny, nx))
            else:
                fields[name] = (("time", "y", "x"),
                                full.reshape(nt, ny, nx))
            va = var_attrs_of(v)
            if va:
                var_attrs[name] = va
        attrs = {k: val for k, val in head._attributes.items()
                 if not k.startswith("shard_")}
    finally:
        for nc in ncs:
            nc.close()
    ncio.write_fields(out_path, dims, coords, fields, attrs=attrs,
                      var_attrs=var_attrs)
    return out_path


def default_streams(dto_seconds: float = 1200.0,
                    split_freq_days: Optional[float] = None) -> List[Stream]:
    """The reference test job's four streams (run/iodef.xml:88-157):
    1h instant, 3h mean, 3h min, 3h max — the wall-clock cadences converted
    to ocean steps for the run's actual dto; iodef.xml splits files daily
    (split_freq="1d")."""
    per_hour = max(1, int(round(3600.0 / dto_seconds)))
    return [
        Stream("kpp_1h_inst", "instant", per_hour,
               split_freq_days=split_freq_days),
        Stream("kpp_3h_mean", "average", 3 * per_hour,
               split_freq_days=split_freq_days),
        Stream("kpp_3h_min", "minimum", 3 * per_hour,
               split_freq_days=split_freq_days),
        Stream("kpp_3h_max", "maximum", 3 * per_hour,
               split_freq_days=split_freq_days),
    ]
