"""Native C++ NetCDF3 encoder vs the pure-Python (scipy) writer.

The native encoder (mckpp_tpu/native/ncwriter.cc) is the framework's
XIOS-analog output component (reference: mckpp_xios_io.F90:11 offloads
writes to the C++ XIOS server).  These tests assert (a) the C++-written
file decodes — via scipy, the independent reader — to exactly the payload
handed in, and (b) it carries the same dims/attrs/values as a scipy-written
file of the same payload.
"""

import os

import numpy as np
import pytest
from scipy.io import netcdf_file

from mckpp_tpu import native
from mckpp_tpu.io import ncio


def _payload(rng):
    dims = {"time": 3, "z": 7, "y": 4, "x": 5}
    coords = {"time": ("time", [1.5, 2.5, 3.5]),
              "z": ("z", rng.standard_normal(7))}
    fields = {
        "T": (("time", "z", "y", "x"), rng.standard_normal((3, 7, 4, 5))),
        "hmix": (("time", "y", "x"), rng.standard_normal((3, 4, 5))),
    }
    attrs = {"reduction": b"average", "fill_value": 1.0e20}
    return dims, coords, fields, attrs


def test_native_roundtrip(tmp_path):
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    dims, coords, fields, attrs = _payload(np.random.default_rng(0))
    path = str(tmp_path / "native.nc")
    assert native.write_fields_native(path, dims, coords, fields, attrs)
    with netcdf_file(path, "r", mmap=False) as nc:
        for name, size in dims.items():
            assert nc.dimensions[name] == size
        for name, (dim, vals) in coords.items():
            np.testing.assert_array_equal(nc.variables[name][:],
                                          np.asarray(vals, np.float64))
        for name, (fdims, arr) in fields.items():
            assert nc.variables[name].dimensions == fdims
            np.testing.assert_array_equal(nc.variables[name][:],
                                          np.asarray(arr, np.float64))
        assert bytes(nc.reduction) == b"average"
        assert float(nc.fill_value) == 1.0e20


def test_native_matches_scipy_writer(tmp_path, monkeypatch):
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    dims, coords, fields, attrs = _payload(np.random.default_rng(1))
    p_native = str(tmp_path / "a.nc")
    assert native.write_fields_native(p_native, dims, coords, fields, attrs)
    # force the scipy path for the comparison file
    monkeypatch.setenv("MCKPP_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_failed", False)
    p_py = str(tmp_path / "b.nc")
    ncio.write_fields(p_py, dims, coords, fields, attrs)
    with netcdf_file(p_native, "r", mmap=False) as na, \
            netcdf_file(p_py, "r", mmap=False) as nb:
        assert set(na.variables) == set(nb.variables)
        for name in na.variables:
            np.testing.assert_array_equal(na.variables[name][:],
                                          nb.variables[name][:])
            assert (na.variables[name].dimensions
                    == nb.variables[name].dimensions)


def test_write_fields_uses_native_when_available(tmp_path):
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    dims, coords, fields, attrs = _payload(np.random.default_rng(2))
    path = str(tmp_path / "c.nc")
    ncio.write_fields(path, dims, coords, fields, attrs)
    with open(path, "rb") as f:
        assert f.read(4) == b"CDF\x02"  # 64-bit-offset file = native encoder
    assert os.path.getsize(path) > 0
