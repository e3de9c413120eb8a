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
        return np.moveaxis(np.asarray(a).reshape(ny, nx, nzp1), -1, 0)

    def grid2(a):
        return np.asarray(a).reshape(ny, nx)

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


class RestartControl:
    """Restart-write cadence (reference: mckpp_restart_control,
    mckpp_xios_control.F90:61-83): write every ndt_per_restart steps and at
    the final step."""

    def __init__(self, outfile: str, ndt_per_restart: int, num_timesteps: int,
                 dto: float, start_days: float):
        self.outfile = outfile
        self.cadence = ndt_per_restart
        self.last = num_timesteps
        self.dto = dto
        self.start = start_days
        self.written = []

    def maybe_write(self, nt: int, st, prm, frc):
        if (self.cadence and nt % self.cadence == 0) or nt == self.last:
            t = self.start + (nt - 1) * self.dto / 86400.0
            p = save_restart(self.outfile, st, prm, frc, nt, t, self.dto)
            self.written.append(p)
            return p
        return None
