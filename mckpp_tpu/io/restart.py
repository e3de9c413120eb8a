"""Checkpoint / resume.

The reference writes XIOS netCDF restarts holding the full two-level time
history (Us, Vs, Ts, Ss, hmixd) plus integration counters old/new and the
surface reference fields (mckpp_xios_io.F90:364-433); resuming requires all
of it for exact continuation (SURVEY.md section 5).

Here the *native* checkpoint is the complete (State, ColumnParams, Forcing)
pytree written bit-exactly to an ``.npz`` — restart-exactness is tested to
machine precision.  :func:`export_reference_restart` additionally writes a
reference-compatible NetCDF restart with the reference's field list, for
interop with MC-KPP tooling.  Filenames are stamped with the validity time
of the *next* step, as the reference does (mckpp_xios_control.F90:61-83).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..state import State, ColumnParams, Forcing
from . import ncio


def _flatten(prefix: str, obj) -> dict:
    out = {}
    for f in dataclasses.fields(obj):
        out[f"{prefix}{f.name}"] = np.asarray(getattr(obj, f.name))
    return out


def _unflatten(cls, prefix: str, data: dict):
    kw = {}
    for f in dataclasses.fields(cls):
        arr = jnp.asarray(data[f"{prefix}{f.name}"])
        kw[f.name] = arr
    return cls(**kw)


def save_restart(path: str, st: State, prm: ColumnParams, frc: Forcing,
                 ntime: int, time_days: float, dto: float):
    """Write an exact checkpoint; the filename is suffixed with the
    validity time of the next step."""
    valid = time_days + dto / 86400.0
    full = f"{path}_{valid:012.5f}.npz"
    blob = {}
    blob.update(_flatten("st_", st))
    blob.update(_flatten("pr_", prm))
    blob.update(_flatten("fr_", frc))
    blob["meta_ntime"] = np.asarray(ntime)
    blob["meta_time_days"] = np.asarray(valid)
    os.makedirs(os.path.dirname(full) or ".", exist_ok=True)
    np.savez(full, **blob)
    return full


def load_restart(path: str) -> Tuple[State, ColumnParams, Forcing, int, float]:
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    st = _unflatten(State, "st_", data)
    prm = _unflatten(ColumnParams, "pr_", data)
    frc = _unflatten(Forcing, "fr_", data)
    return st, prm, frc, int(data["meta_ntime"]), float(data["meta_time_days"])


def export_reference_restart(path: str, st: State, prm: ColumnParams,
                             nx: int, ny: int, time_days: float, dto: float):
    """Reference-compatible NetCDF restart (field list of
    mckpp_xios_io.F90:406-433: time, uvel, vvel, T, S, CP, rho, hmix, kmix,
    Sref, SSref, Ssurf, Tref, old, new, Us, Vs, Ts, Ss, hmixd)."""
    nzp1 = st.u.shape[-2]

    def grid3(a):    # (ncol, nzp1) -> (z, y, x)
        # restarts stay float64 regardless of the model dtype (the
        # reference's restart files are real64; only diagnostics follow
        # XIOS's 4-byte default)
        return np.moveaxis(
            np.asarray(a, np.float64).reshape(ny, nx, nzp1), -1, 0)

    def grid2(a):
        return np.asarray(a, np.float64).reshape(ny, nx)

    dims = {"z": nzp1, "y": ny, "x": nx, "two": 2, "t": 1}
    fields = {
        "time": (("t",), np.asarray([time_days + dto / 86400.0])),
        "uvel": (("z", "y", "x"), grid3(st.u[..., 0])),
        "vvel": (("z", "y", "x"), grid3(st.u[..., 1])),
        "T": (("z", "y", "x"), grid3(st.x[..., 0])),
        "S": (("z", "y", "x"), grid3(st.x[..., 1])),
        "CP": (("z", "y", "x"), grid3(st.cp)),
        "rho": (("z", "y", "x"), grid3(st.rho)),
        "hmix": (("y", "x"), grid2(st.hmix)),
        "kmix": (("y", "x"), grid2(st.kmix.astype(jnp.float64))),
        "Sref": (("y", "x"), grid2(prm.sref)),
        "SSref": (("y", "x"), grid2(prm.ssref)),
        "Ssurf": (("y", "x"), grid2(st.ssurf)),
        "Tref": (("y", "x"), grid2(st.tref)),
        "old": (("y", "x"), grid2(st.old.astype(jnp.float64))),
        "new": (("y", "x"), grid2(st.new.astype(jnp.float64))),
        "Us": (("two", "z", "y", "x"),
               np.stack([grid3(st.us[..., 0, k]) for k in range(2)])),
        "Vs": (("two", "z", "y", "x"),
               np.stack([grid3(st.us[..., 1, k]) for k in range(2)])),
        "Ts": (("two", "z", "y", "x"),
               np.stack([grid3(st.xs[..., 0, k]) for k in range(2)])),
        "Ss": (("two", "z", "y", "x"),
               np.stack([grid3(st.xs[..., 1, k]) for k in range(2)])),
        "hmixd": (("two", "y", "x"),
                  np.stack([grid2(st.hmixd[:, k]) for k in range(2)])),
    }
    ncio.write_fields(path, dims, {}, fields)
    return path


def import_reference_restart(path: str, st: State, prm: ColumnParams,
                             grid=None):
    """Read a reference-format NetCDF restart (the field set of
    mckpp_xios_restart_input, mckpp_xios_io.F90:436-465) into
    (State, ColumnParams).

    Work arrays not in the reference restart (diffusivities, fluxes,
    correction fields) stay at their initial values — exactly the
    reference's resume semantics, where ntime restarts at 1 and the first
    vertical-mixing call rebuilds them.  The swfrac/swdk_opt caches are
    reseeded here (the reference rebuilds them at ntime <= 1,
    mckpp_fluxes_mod.F90:101-106, bldepth:113-115).

    Returns (state, params, time_days) with time_days the validity time
    stored in the file.
    """
    import jax

    with ncio.open_nc(path) as nc:
        def f3(name):                     # (z, y, x) -> (ncol, nzp1)
            a = ncio.get_var(nc, name)
            return jnp.asarray(np.moveaxis(a, 0, -1).reshape(-1, a.shape[0]))

        def f2(name):                     # (y, x) -> (ncol,)
            return jnp.asarray(ncio.get_var(nc, name).reshape(-1))

        def f4(name):                     # (two, z, y, x) -> (ncol, nzp1, 2)
            a = ncio.get_var(nc, name)
            two, nz1 = a.shape[0], a.shape[1]
            flat = a.reshape(two, nz1, -1)
            return jnp.asarray(np.transpose(flat, (2, 1, 0)))

        dtype = st.u.dtype
        u = jnp.stack([f3("uvel"), f3("vvel")], axis=-1).astype(dtype)
        x = jnp.stack([f3("T"), f3("S")], axis=-1).astype(dtype)
        us = jnp.stack([f4("Us"), f4("Vs")], axis=-2).astype(dtype)
        xs = jnp.stack([f4("Ts"), f4("Ss")], axis=-2).astype(dtype)
        hmixd_in = ncio.get_var(nc, "hmixd")           # (two, y, x)
        hmixd = jnp.asarray(hmixd_in.reshape(2, -1).T).astype(dtype)
        st = dataclasses.replace(
            st, u=u, x=x, us=us, xs=xs, hmixd=hmixd,
            cp=f3("CP").astype(dtype), rho=f3("rho").astype(dtype),
            hmix=f2("hmix").astype(dtype),
            kmix=f2("kmix").astype(jnp.int32),
            ssurf=f2("Ssurf").astype(dtype), tref=f2("Tref").astype(dtype),
            old=f2("old").astype(jnp.int32),
            new=f2("new").astype(jnp.int32))
        prm = dataclasses.replace(
            prm, sref=f2("Sref").astype(dtype),
            ssref=f2("SSref").astype(dtype))
        time_days = float(ncio.get_var(nc, "time").reshape(-1)[0])

    if grid is not None:
        from ..ops.swfrac import swfrac_levels, swdk
        swf = jax.vmap(lambda j: swfrac_levels(1.0, grid.zm, j))(prm.jerlov)
        swdk_opt = jax.vmap(lambda j: swdk(-grid.dm, j))(prm.jerlov)
        st = dataclasses.replace(st, swfrac=swf.astype(st.u.dtype),
                                 swdk_opt=swdk_opt.astype(st.u.dtype))
    return st, prm, time_days


class RestartControl:
    """Restart-write cadence (reference: mckpp_restart_control,
    mckpp_xios_control.F90:61-83): write every ndt_per_restart steps and at
    the final step.

    Writes are detached from the step loop (``async_write``), like the
    reference's XIOS-server restart path: ``maybe_write`` hands the state
    to a background thread which performs the device->host fetch (via the
    optional ``fetch`` callable) and the .npz/NetCDF encode, so the loop
    never blocks on restart I/O.  The caller must pass state the next step
    will NOT donate — on a donating step path, an on-device snapshot
    (cheap HBM copy) — or pre-gathered host arrays."""

    def __init__(self, outfile: str, ndt_per_restart: int, num_timesteps: int,
                 dto: float, start_days: float,
                 netcdf_grid: Optional[Tuple[int, int]] = None,
                 async_write: bool = True):
        """``netcdf_grid=(nx, ny)`` additionally writes each restart in
        the reference's NetCDF format (field list of
        mckpp_xios_io.F90:406-433) next to the exact .npz."""
        self.outfile = outfile
        self.cadence = ndt_per_restart
        self.last = num_timesteps
        self.dto = dto
        self.start = start_days
        self.netcdf_grid = netcdf_grid
        self.written = []
        from concurrent.futures import ThreadPoolExecutor
        self._writer = ThreadPoolExecutor(max_workers=1) if async_write \
            else None
        self._pending = []

    def due(self, nt: int) -> bool:
        """True when step nt writes a restart — callers on the sharded
        path gate the (expensive) state gather on this, so non-writing
        steps perform no cross-host transfers."""
        return bool(self.cadence and nt % self.cadence == 0) or nt == self.last

    def _write(self, nt, st, prm, frc, fetch):
        if fetch is not None:
            st, prm, frc = fetch(st), fetch(prm), fetch(frc)
        t = self.start + (nt - 1) * self.dto / 86400.0
        p = save_restart(self.outfile, st, prm, frc, nt, t, self.dto)
        self.written.append(p)
        if self.netcdf_grid is not None:
            nx, ny = self.netcdf_grid
            valid = t + self.dto / 86400.0
            pn = export_reference_restart(
                f"{self.outfile}_{valid:012.5f}.nc", st, prm,
                nx, ny, t, self.dto)
            self.written.append(pn)
        return p

    def maybe_write(self, nt: int, st, prm, frc, fetch=None):
        if self.due(nt):
            import jax
            if jax.process_count() > 1 and jax.process_index() != 0:
                return None        # single writer: process 0 owns the file
            if self._writer is not None:
                # fail fast: surface any already-failed detached write NOW
                # (e.g. disk full) instead of silently queueing further
                # doomed writes until the end-of-run flush()
                still = []
                for fut in self._pending:
                    if fut.done():
                        fut.result()   # raises if the write failed
                    else:
                        still.append(fut)
                self._pending = still
                self._pending.append(
                    self._writer.submit(self._write, nt, st, prm, frc,
                                        fetch))
                return None
            return self._write(nt, st, prm, frc, fetch)
        return None

    def flush(self):
        """Wait for queued restart writes; returns the paths written."""
        for fut in self._pending:
            fut.result()            # surfaces writer-thread exceptions
        self._pending = []
        return self.written
