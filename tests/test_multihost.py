"""Multi-process (multi-host) execution proof (VERDICT r2 item 1).

Spawns real subprocesses that call ``jax.distributed.initialize`` with a
local coordinator, build a ColumnLayout over the global device set, read
flux/SST ancillaries HOST-LOCALLY (each process only its slab of rows),
run the jitted sharded step, and gather the trajectory.  The 2-process
run must equal the single-process run bitwise — proving the slab math,
``make_array_from_process_local_data`` scatter, and ``process_allgather``
paths that a TPU pod would use (the reference's intended MPI-over-columns
decomposition, README.md:5; mckpp_xios_control.F90:20-28).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _write_inputs(d):
    """Deterministic SST + flux files on the worker's 5x3 grid, values
    varying with (time, column) so a scatter misalignment cannot cancel."""
    sys.path.insert(0, os.path.dirname(HERE))
    from mckpp_tpu.io import ncio

    nx, ny = 5, 3
    dto = 1800.0                      # dtsec=3600, ndtocn=2
    lon = np.arange(nx, dtype=float)
    lat = np.arange(ny, dtype=float)
    col = (np.arange(nx * ny, dtype=float).reshape(ny, nx))

    # SST on the ndtupdsst=2 cadence (method 1: read at t + period/2),
    # stored in KELVIN to exercise the domain-global autoconvert
    period = 2 * dto / 86400.0
    times = (np.arange(40) + 0.5) * period
    sst = 288.0 + col[None] + 10.0 * times[:, None, None]
    ncio.write_fields(
        f"{d}/sst.nc",
        {"t": len(times), "latitude": ny, "longitude": nx},
        {"t": ("t", times), "latitude": ("latitude", lat),
         "longitude": ("longitude", lon)},
        {"sst": (("t", "latitude", "longitude"), sst)})

    fperiod = 2 * dto / 86400.0       # flux reads every ndtocn=2 steps
    ftimes = (np.arange(40) + 0.5) * fperiod
    mk = lambda base: base + 0.01 * col[None] + 0.1 * ftimes[:, None, None]
    fields = {
        "taux": (("time", "latitude", "longitude"), mk(0.03)),
        "tauy": (("time", "latitude", "longitude"), mk(0.01)),
        "swf": (("time", "latitude", "longitude"), mk(180.0)),
        "lwf": (("time", "latitude", "longitude"), mk(-50.0)),
        "lhf": (("time", "latitude", "longitude"), mk(-110.0)),
        "shf": (("time", "latitude", "longitude"), mk(-9.0)),
        "precip": (("time", "latitude", "longitude"), mk(4e-5)),
    }
    ncio.write_fields(
        f"{d}/fluxes.nc",
        {"time": len(ftimes), "latitude": ny, "longitude": nx},
        {"time": ("time", ftimes), "latitude": ("latitude", lat),
         "longitude": ("longitude", lon)},
        fields)


def _run_workers(nprocs, devcount, datadir, out, steps=4):
    port = _free_port()
    procs = []
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    for pid in range(nprocs):
        cmd = [sys.executable, WORKER,
               "--nprocs", str(nprocs), "--procid", str(pid),
               "--coordinator", f"localhost:{port}",
               "--devcount", str(devcount),
               "--datadir", datadir, "--out", out,
               "--steps", str(steps)]
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout.decode(errors="replace"))
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed (rc={p.returncode}):\n{o}"
    return outputs


def test_slab_reads_match_full_reads(tmp_path):
    """Host-local row-range reads must equal the matching slice of a
    full-domain read for every (lo, hi) — the slab math that multi-host
    scatter depends on (fast, in-process)."""
    _write_inputs(str(tmp_path))
    from mckpp_tpu.io.ancillaries import AncillaryReader

    rd = AncillaryReader(f"{tmp_path}/sst.nc", 0.0, 0.0, 5, 3)
    full = rd._read2d_uncached("sst", 3)
    for lo, hi in [(0, 15), (0, 8), (8, 15), (7, 8), (4, 11), (15, 15),
                   (14, 15)]:
        got = rd._read2d_uncached("sst", 3, rows=(lo, hi))
        np.testing.assert_array_equal(got, full[lo:hi], err_msg=f"{lo}:{hi}")


@pytest.mark.slow
def test_two_process_bitwise_equals_single(tmp_path):
    _write_inputs(str(tmp_path))
    out1 = str(tmp_path / "single.npz")
    out2 = str(tmp_path / "double.npz")
    _run_workers(1, 4, str(tmp_path), out1)
    _run_workers(2, 2, str(tmp_path), out2)

    with np.load(out1) as a, np.load(out2) as b:
        assert set(a.files) == set(b.files)
        for k in a.files:
            np.testing.assert_array_equal(
                a[k], b[k], err_msg=f"{k} differs between 1- and 2-process")
        # sanity: the run actually did something
        assert np.all(np.isfinite(a["x"]))
        assert a["x"].shape[0] == 15     # unpadded domain gathered
