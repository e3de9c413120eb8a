"""Native (C++) runtime components and their ctypes bindings.

The reference delegates its output path to XIOS, a native C++ I/O server
(mckpp_xios_io.F90:11; README.md:13).  This package provides the
TPU-framework equivalent: small, dependency-free C++ libraries built on
first use with the local toolchain and loaded via ctypes.  Everything here
is optional — every caller falls back to the pure-Python implementation if
the toolchain is unavailable (set ``MCKPP_NO_NATIVE=1`` to force that).

Current components:

* ``ncwriter.cc`` — streaming big-endian NetCDF3 encoder used by the
  diagnostics background writer (see io/ncio.py:write_fields).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _default_cache_dir() -> str:
    """Per-user build cache.  A world-writable location (e.g. /tmp) would
    let another user pre-plant a .so that ctypes would then load; use
    ~/.cache (or XDG_CACHE_HOME) instead and create it mode 0700."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
    if base.startswith("~"):        # no resolvable home dir: per-uid tmp dir
        base = os.path.join(tempfile.gettempdir(), f"mckpp-uid{os.getuid()}")
    return os.path.join(base, "mckpp_tpu_native")


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(_SRC_DIR, "ncwriter.cc")
    cache = os.environ.get("MCKPP_NATIVE_CACHE", _default_cache_dir())
    os.makedirs(cache, mode=0o700, exist_ok=True)
    stat = os.stat(cache)
    if stat.st_uid != os.getuid():
        raise RuntimeError(f"native cache dir {cache} owned by uid "
                           f"{stat.st_uid}, not {os.getuid()}; refusing to "
                           "load code from it (set MCKPP_NATIVE_CACHE)")
    sofile = os.path.join(cache, "libmckpp_native.so")
    if (not os.path.exists(sofile)
            or os.path.getmtime(sofile) < os.path.getmtime(src)):
        tmp = sofile + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, sofile)  # atomic vs concurrent builders
    lib = ctypes.CDLL(sofile)
    lib.ncw_create.restype = ctypes.c_void_p
    lib.ncw_create.argtypes = [ctypes.c_char_p]
    lib.ncw_def_dim.restype = ctypes.c_int
    lib.ncw_def_dim.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_longlong]
    lib.ncw_att_text.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.c_char_p]
    lib.ncw_att_double.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_double]
    lib.ncw_def_var_f64.restype = ctypes.c_int
    lib.ncw_def_var_f64.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.c_void_p]
    lib.ncw_def_var_f32.restype = ctypes.c_int
    lib.ncw_def_var_f32.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.c_void_p]
    lib.ncw_var_att_text.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.c_char_p, ctypes.c_char_p]
    lib.ncw_var_att_double.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.c_char_p, ctypes.c_double]
    lib.ncw_close.restype = ctypes.c_longlong
    lib.ncw_close.argtypes = [ctypes.c_void_p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is None and not _lib_failed:
            if os.environ.get("MCKPP_NO_NATIVE"):
                _lib_failed = True
            else:
                try:
                    _lib = _build_and_load()
                except Exception:
                    _lib_failed = True
    return _lib


def write_fields_native(path: str, dims: dict, coords: dict, fields: dict,
                        attrs: Optional[dict] = None,
                        var_attrs: Optional[dict] = None) -> bool:
    """Encode a write_fields-shaped payload with the C++ encoder.

    Returns True on success; False means the caller should fall back to the
    Python writer (toolchain missing, record dim requested, I/O error).
    """
    lib = get_lib()
    if lib is None or any(size is None for size in dims.values()):
        return False
    h = lib.ncw_create(path.encode())
    dim_ids = {}
    keep = []  # keep array refs alive until ncw_close
    ok = True
    try:
        for name, size in dims.items():
            dim_ids[name] = lib.ncw_def_dim(h, name.encode(), int(size))
            ok &= dim_ids[name] >= 0
        for k, val in (attrs or {}).items():
            if isinstance(val, (bytes, str)):
                v = val if isinstance(val, bytes) else val.encode()
                lib.ncw_att_text(h, k.encode(), v)
            else:
                lib.ncw_att_double(h, k.encode(), float(val))

        def def_var(name, fdims, arr):
            # honor the payload dtype: float32 arrays (the production
            # diagnostic windows) encode as NC_FLOAT — the XIOS default
            # output precision (run/iodef.xml has no prec attrs) — at
            # half the bytes; everything else as NC_DOUBLE
            f32 = getattr(arr, "dtype", None) == np.float32
            a = np.ascontiguousarray(arr, dtype="<f4" if f32 else "<f8")
            keep.append(a)
            ids = (ctypes.c_int * len(fdims))(*[dim_ids[d] for d in fdims])
            defv = lib.ncw_def_var_f32 if f32 else lib.ncw_def_var_f64
            vid = defv(h, name.encode(), len(fdims), ids,
                       a.ctypes.data_as(ctypes.c_void_p))
            for k, val in ((var_attrs or {}).get(name) or {}).items():
                if isinstance(val, (bytes, str)):
                    v = val if isinstance(val, bytes) else val.encode()
                    lib.ncw_var_att_text(h, vid, k.encode(), v)
                else:
                    lib.ncw_var_att_double(h, vid, k.encode(), float(val))
            return vid >= 0

        for name, (dim, vals) in coords.items():
            ok &= def_var(name, (dim,), vals)
        for name, (fdims, arr) in fields.items():
            ok &= def_var(name, fdims, arr)
    except Exception:
        # payloads the native subset can't express (unknown dim name,
        # array-valued attrs, non-numeric data) fall back to the
        # pure-Python writer; ncw_close still frees the handle
        lib.ncw_close(h)
        return False
    nbytes = lib.ncw_close(h)
    return ok and nbytes > 0
