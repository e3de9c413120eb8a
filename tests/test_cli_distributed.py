"""The REAL CLI over two jax.distributed processes — the exact mechanism
the launch scripts use (launch/KPPocean_tpu.slurm exports KPP_COORDINATOR
/ KPP_NUM_PROCS / KPP_PROC_ID and runs `mckpp_tpu.cli --distributed` per
node).  Output files from the 2-process run must equal the single-process
run's bitwise: process 0 is the single writer, diagnostics gather only on
emit, ancillaries are read host-locally."""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

pytestmark = pytest.mark.slow


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_cli(datadir, outdir, nprocs, devcount, steps=9, extra_args=()):
    os.makedirs(outdir, exist_ok=True)
    base_env = {k: v for k, v in os.environ.items()
                if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # drop the dev box's axon site dir: its sitecustomize force-selects
    # the tunnelled TPU platform even under JAX_PLATFORMS=cpu, collapsing
    # the virtual CPU device mesh to 1 real chip
    ambient = [p for p in base_env.get("PYTHONPATH", "").split(os.pathsep)
               if p and "axon" not in p]
    base_env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={devcount}",
        "PYTHONPATH": os.pathsep.join([ROOT] + ambient),
    })
    cmd = [sys.executable, "-m", "mckpp_tpu.cli",
           "--namelist", f"{datadir}/3D_ocn.nml", "--data-dir", str(datadir),
           "--output-dir", str(outdir), "--steps", str(steps),
           *extra_args]
    if nprocs == 1:
        r = subprocess.run(cmd + ["--multi-device"], env=base_env,
                           capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stdout + r.stderr
        return [r.stdout + r.stderr]
    port = _free_port()
    procs = []
    for pid in range(nprocs):
        env = dict(base_env,
                   KPP_COORDINATOR=f"localhost:{port}",
                   KPP_NUM_PROCS=str(nprocs), KPP_PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            cmd + ["--distributed"], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(stdout.decode(errors="replace"))
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"cli worker rc={p.returncode}:\n{o[-4000:]}"
    return outs


def test_cli_distributed_matches_single(tmp_path):
    sys.path.insert(0, HERE)
    from test_endtoend import write_inputs
    from mckpp_tpu.io import ncio

    data = tmp_path / "data"
    data.mkdir()
    write_inputs(pathlib.Path(data), sst=True)

    out1 = tmp_path / "out1"
    out2 = tmp_path / "out2"
    _run_cli(data, out1, nprocs=1, devcount=4)
    _run_cli(data, out2, nprocs=2, devcount=2)

    files1 = sorted(p.name for p in out1.glob("*.nc"))
    files2 = sorted(p.name for p in out2.glob("*.nc"))
    assert files1 == files2 and files1, (files1, files2)
    for name in files1:
        with ncio.open_nc(str(out1 / name)) as a, \
                ncio.open_nc(str(out2 / name)) as b:
            assert set(a.variables) == set(b.variables), name
            for v in a.variables:
                np.testing.assert_array_equal(
                    np.asarray(a.variables[v][:]),
                    np.asarray(b.variables[v][:]),
                    err_msg=f"{name}:{v}")
    # restart written by process 0 only, same bytes as the 1-proc run
    r1 = sorted(p.name for p in out1.glob("restart*.npz"))
    r2 = sorted(p.name for p in out2.glob("restart*.npz"))
    assert r1 == r2
    for name in r1:
        with np.load(out1 / name) as a, np.load(out2 / name) as b:
            assert set(a.files) == set(b.files)
            for k in a.files:
                np.testing.assert_array_equal(a[k], b[k],
                                              err_msg=f"{name}:{k}")


def test_cli_distributed_shard_write_matches_single(tmp_path):
    """--output-mode shard under 2 processes (VERDICT r3 item 4): each
    process writes its own row-slab files with ZERO emit-time allgathers
    (asserted via the CLI's transfer-counter report), and merging the
    per-rank files reproduces the single-process output value-exactly —
    the XIOS multiple_file workflow (run/iodef.xml:88 one_file attr is the
    collective alternative)."""
    import collections

    sys.path.insert(0, HERE)
    from test_endtoend import write_inputs
    from mckpp_tpu.io import ncio
    from mckpp_tpu.io.diagnostics import merge_shard_files

    data = tmp_path / "data"
    data.mkdir()
    write_inputs(pathlib.Path(data), sst=True)

    out1 = tmp_path / "out1"
    outs = tmp_path / "outs"
    _run_cli(data, out1, nprocs=1, devcount=4)
    logs = _run_cli(data, outs, nprocs=2, devcount=2,
                    extra_args=("--output-mode", "shard"))
    # every process wrote, and NO cross-host gather happened on emit
    for log in logs:
        assert "diag emit gathers: 0" in log, log[-2000:]

    # group the per-rank files by stream/split base name
    groups = collections.defaultdict(list)
    for p in outs.glob("*_p[0-9].nc"):
        base = p.name.rsplit("_p", 1)[0]
        groups[base].append(p)
    assert groups, (
        f"no shard files written; outs contains "
        f"{sorted(p.name for p in outs.iterdir())};\n"
        f"p0 log tail:\n{logs[0][-3000:]}")
    merged_dir = tmp_path / "merged"
    merged_dir.mkdir()
    names1 = sorted(p.name for p in out1.glob("*.nc"))
    assert sorted(f"{b}.nc" for b in groups) == names1
    for base, paths in groups.items():
        assert len(paths) == 2, (base, paths)   # one file per process
        merged = merge_shard_files(paths, str(merged_dir / f"{base}.nc"))
        with ncio.open_nc(str(out1 / f"{base}.nc")) as a, \
                ncio.open_nc(merged) as b:
            assert set(a.variables) == set(b.variables), base
            for v in a.variables:
                np.testing.assert_array_equal(
                    np.asarray(a.variables[v][:]),
                    np.asarray(b.variables[v][:]),
                    err_msg=f"{base}:{v}")


def test_launch_scripts_are_valid_shell():
    """The pod/Slurm launchers cannot execute here (no cluster), but their
    shell must parse and they must invoke exactly the mechanism the
    2-process tests prove (KPP_* env + `mckpp_tpu.cli --distributed`)."""
    import subprocess as sp
    launch = os.path.join(ROOT, "launch")
    for name in ("kpp_tpu_pod.sh", "KPPocean_tpu.slurm"):
        path = os.path.join(launch, name)
        r = sp.run(["bash", "-n", path], capture_output=True, text=True)
        assert r.returncode == 0, f"{name}: {r.stderr}"
        text = open(path).read()
        assert "mckpp_tpu.cli" in text and "--distributed" in text, name
    # the Slurm script wires the explicit KPP_* rendezvous (what these
    # tests exercise); the pod script relies on the TPU runtime's
    # auto-inference (jax.distributed.initialize() with no args)
    slurm = open(os.path.join(launch, "KPPocean_tpu.slurm")).read()
    for var in ("KPP_COORDINATOR", "KPP_NUM_PROCS", "KPP_PROC_ID"):
        assert var in slurm, var
