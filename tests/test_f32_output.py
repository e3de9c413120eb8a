"""4-byte diagnostic output (XIOS precision parity, VERDICT r4 item 3).

The reference's iodef.xml carries no ``prec`` attributes
(/root/reference/run/iodef.xml:88-157), so XIOS writes its default 4-byte
floats.  Both writers (native C++ encoder and the scipy fallback) must
encode float32 payloads as NC_FLOAT — halving output bytes — while float64
payloads (coordinates, restarts) stay NC_DOUBLE."""

import os

import numpy as np
import pytest
from scipy.io import netcdf_file

from mckpp_tpu.io import ncio


def _payload(rng):
    t = np.arange(3, dtype=np.float64)
    z = np.linspace(0, -100, 5)
    f32 = rng.standard_normal((3, 5, 4)).astype(np.float32)
    f64 = rng.standard_normal((3, 4))
    dims = {"time": 3, "z": 5, "x": 4}
    coords = {"time": ("time", t), "z": ("z", z)}
    fields = {"T": (("time", "z", "x"), f32),
              "hmix64": (("time", "x"), f64)}
    return dims, coords, fields, f32, f64


@pytest.mark.parametrize("native", [True, False])
def test_f32_fields_roundtrip(tmp_path, native, monkeypatch):
    if not native:
        monkeypatch.setenv("MCKPP_NO_NATIVE", "1")
        # the native module caches its load decision per process
        from mckpp_tpu import native as native_mod
        monkeypatch.setattr(native_mod, "_lib", None)
        monkeypatch.setattr(native_mod, "_lib_failed", True)
    rng = np.random.default_rng(0)
    dims, coords, fields, f32, f64 = _payload(rng)
    path = str(tmp_path / f"out_{native}.nc")
    ncio.write_fields(path, dims, coords, fields,
                      attrs={"note": "t"}, var_attrs={"T": {"units": "C"}})
    with netcdf_file(path, "r", mmap=False) as nc:
        vT = nc.variables["T"]
        assert vT.data.dtype.kind == "f" and vT.data.dtype.itemsize == 4
        np.testing.assert_array_equal(
            np.asarray(vT[:], np.float32), f32)
        v64 = nc.variables["hmix64"]
        assert v64.data.dtype.itemsize == 8
        np.testing.assert_array_equal(np.asarray(v64[:]), f64)
        # coordinates stay f64
        assert nc.variables["time"].data.dtype.itemsize == 8
        assert vT.units == b"C"


def test_native_and_fallback_files_equal_values(tmp_path, monkeypatch):
    rng = np.random.default_rng(1)
    dims, coords, fields, f32, f64 = _payload(rng)
    p_native = str(tmp_path / "native.nc")
    ncio.write_fields(p_native, dims, coords, fields)

    from mckpp_tpu import native as native_mod
    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_lib_failed", True)
    p_py = str(tmp_path / "python.nc")
    ncio.write_fields(p_py, dims, coords, fields)

    with netcdf_file(p_native, "r", mmap=False) as a, \
            netcdf_file(p_py, "r", mmap=False) as b:
        for name in ("time", "z", "T", "hmix64"):
            np.testing.assert_array_equal(np.asarray(a.variables[name][:]),
                                          np.asarray(b.variables[name][:]))
            assert a.variables[name].data.dtype == b.variables[name].data.dtype


def test_f32_files_half_the_bytes(tmp_path):
    rng = np.random.default_rng(2)
    big32 = rng.standard_normal((4, 64, 64)).astype(np.float32)
    big64 = big32.astype(np.float64)
    dims = {"t": 4, "y": 64, "x": 64}
    p32 = str(tmp_path / "f32.nc")
    p64 = str(tmp_path / "f64.nc")
    ncio.write_fields(p32, dims, {}, {"v": (("t", "y", "x"), big32)})
    ncio.write_fields(p64, dims, {}, {"v": (("t", "y", "x"), big64)})
    s32, s64 = os.path.getsize(p32), os.path.getsize(p64)
    assert s32 < 0.55 * s64, (s32, s64)


def test_diag_window_written_f32(tmp_path):
    """An f32 model's diagnostic stream lands on disk as 4-byte floats,
    and the values survive the round trip exactly (f32 -> NC_FLOAT is
    lossless)."""
    import jax.numpy as jnp
    from mckpp_tpu.io.diagnostics import DiagnosticsManager, Stream
    from mckpp_tpu.state import init_state, init_params, init_forcing

    ncol, nzp1 = 6, 4
    st = init_state(ncol, nzp1, jnp.float32)
    prm = init_params(ncol, nzp1, dtype=jnp.float32)
    frc = init_forcing(ncol, nzp1, jnp.float32)
    import dataclasses
    st = dataclasses.replace(
        st, hmix=jnp.arange(ncol, dtype=jnp.float32) + 1.5,
        x=st.x.at[..., 0].set(20.0))
    streams = [Stream("diag32", "instant", 1, fields=("T", "hmix"))]
    mgr = DiagnosticsManager(streams, nx=ncol, ny=1,
                             zm=np.linspace(0, -30, nzp1),
                             outdir=str(tmp_path), dto_seconds=1200.0)
    mgr.step(1, st, prm, frc)
    paths = mgr.flush()
    with netcdf_file(paths["diag32"], "r", mmap=False) as nc:
        vh = nc.variables["hmix"]
        assert vh.data.dtype.itemsize == 4
        np.testing.assert_array_equal(
            np.asarray(vh[:], np.float32).reshape(-1),
            np.arange(ncol, dtype=np.float32) + 1.5)
