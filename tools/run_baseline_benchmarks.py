"""Run the five BASELINE.json benchmark configurations END-TO-END on the
real chip — the actual CLI with flux files, ancillary updates, the
reference-shaped iodef.xml output streams, and restarts — and record
wall-clock per model day + column-steps/s (VERDICT r2 item 4; the
reference's anchor is 144,507 columns x 72 steps inside a 1 h Slurm
budget, run/KPPocean.slurm:4).

Usage: python tools/run_baseline_benchmarks.py [--configs a,b,...]
       [--steps 72] [--workdir /tmp/bench_runs] [--keep]

Writes one JSON line per config to stdout and accumulates
``BENCH_CONFIGS.json`` in the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CONFIGS = ["single_column", "regional_64x64", "terramaris", "global_1deg",
           "ensemble10_dd"]


def parse_timers(text: str):
    out = {}
    for line in text.splitlines():
        m = re.match(r"^(\w[\w ]*?)\s+(\d+)\s+([\d.]+)\s*$", line)
        if m:
            out[m.group(1).strip()] = (int(m.group(2)), float(m.group(3)))
    return out


def domain_of(config):
    return {"single_column": (1, 1, 100), "regional_64x64": (64, 64, 40),
            "terramaris": (453, 319, 69), "global_1deg": (360, 180, 40),
            "ensemble10_dd": (360, 180, 40)}[config]


def run_cli_config(config, workdir, steps):
    d = os.path.join(workdir, config)
    shutil.rmtree(d, ignore_errors=True)
    subprocess.run([sys.executable, f"{ROOT}/tools/make_benchmark_configs.py",
                    config, d], check=True)
    out = os.path.join(d, "out")

    def once():
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, "-m", "mckpp_tpu.cli",
             "--namelist", f"{d}/3D_ocn.nml", "--data-dir", d,
             "--output-dir", out, "--steps", str(steps),
             "--dtype", "float32"],
            capture_output=True, text=True, cwd=ROOT,
            env={**os.environ,
                 "PYTHONPATH": ROOT + os.pathsep
                 + os.environ.get("PYTHONPATH", "")})
        wall = time.perf_counter() - t0
        if r.returncode != 0:
            tail = "\n".join((r.stdout + r.stderr).splitlines()[-25:])
            raise RuntimeError(f"{config} failed rc={r.returncode}:\n{tail}")
        return wall, r

    wall, r = once()
    wall_cold = wall
    timers = parse_timers(r.stdout)
    m = re.search(r"steady-state: ([\d.]+) s for the last (\d+) steps",
                  r.stdout)
    steady = None
    if m:
        steady = round(float(m.group(2)) / float(m.group(1))
                       * domain_of(config)[0] * domain_of(config)[1], 1)
    nx, ny, nz = domain_of(config)
    ncol = nx * ny
    phys = timers.get("Physics", (0, float("nan")))[1]
    total = timers.get("Total", (0, wall))[1]
    ncs = [f for f in os.listdir(out) if f.endswith(".nc")]
    n_out = len(ncs)
    out_bytes = sum(os.path.getsize(os.path.join(out, f)) for f in ncs)
    return {
        "config": config, "ncol": ncol, "nz": nz, "steps": steps,
        "output_bytes": out_bytes,
        "wall_s": round(wall, 2), "model_loop_s": round(total, 2),
        "physics_s": round(phys, 2),
        "col_steps_per_s_steady": steady,
        "col_steps_per_s_wall": round(ncol * steps / total, 1),
        "output_files": n_out,
        "diag_s": round(timers.get("Diagnostic output", (0, 0.0))[1], 2),
        "flux_s": round(timers.get("Update surface fluxes", (0, 0.0))[1], 2),
        "init_s": round(timers.get("Initialization", (0, 0.0))[1], 2),
        "timers": {k: v[1] for k, v in timers.items()},
    }


def run_ensemble(workdir, steps, n_members=10):
    """ensemble10_dd: the global config x 10 perturbed members via the
    ensemble library (members = replicated columns), full-step mode."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    d = os.path.join(workdir, "ensemble10_dd")
    shutil.rmtree(d, ignore_errors=True)
    subprocess.run([sys.executable, f"{ROOT}/tools/make_benchmark_configs.py",
                    "ensemble10_dd", d], check=True)

    from mckpp_tpu.utils import namelist as nml
    from mckpp_tpu import setup as setup_mod
    from mckpp_tpu import forcing as forcing_mod
    from mckpp_tpu import ensemble as ens

    cfg, _ = nml.load_config(f"{d}/3D_ocn.nml")
    cfg = dataclasses.replace(cfg, dtype="float32")
    model, st, prm, frc, flux_provider, mgr = setup_mod.build(cfg, d)
    ncol1 = st.u.shape[0]

    key = jax.random.PRNGKey(0)

    def perturb(m, k, sm, pm, fm):
        noise = 0.01 * jax.random.normal(k, sm.x[..., 0].shape,
                                         dtype=sm.x.dtype)
        return (dataclasses.replace(
            sm, x=sm.x.at[..., 0].add(noise),
            xs=sm.xs.at[..., 0, :].add(noise[..., None])), pm, fm)

    st, prm, frc = ens.make_ensemble(st, prm, frc, n_members,
                                     perturb=perturb, key=key)
    ncol = st.u.shape[0]
    l_ocean_rep = np.asarray(prm.l_ocean)
    # pad for the Pallas tile
    from mckpp_tpu.parallel import sharding as sh
    from mckpp_tpu.parallel import distributed as dist
    mesh = sh.make_mesh(jax.devices()[:1])
    layout = dist.make_layout(ncol, mesh,
                              pad_multiple=cfg.physics.pass_block)
    st = layout.shard_tree(st)
    prm = layout.shard_tree(prm)
    frc = layout.shard_tree(frc)

    def rep_flux(time_days):
        raw = flux_provider(time_days)
        rep = ens.replicate(raw, n_members)
        return jax.tree_util.tree_map(
            lambda a: layout.global_array(np.asarray(a), local=False), rep)

    # FULL output path, like the CLI configs (VERDICT r3 item 7): the
    # reference-shaped iodef streams over all members (members stack on
    # the column axis, so the output grid is (ny*members, nx)), plus
    # daily restarts through the detached writer.
    from mckpp_tpu.io.diagnostics import DiagnosticsManager
    from mckpp_tpu.io.streams import parse_iodef
    from mckpp_tpu.io.restart import RestartControl
    nx, ny, nz = domain_of("ensemble10_dd")
    out = os.path.join(d, "out")
    os.makedirs(out, exist_ok=True)
    streams = parse_iodef(f"{d}/iodef.xml", cfg.time.dto)
    diag = DiagnosticsManager(
        streams, nx, ny * n_members, model.grid.zm, outdir=out,
        start_time_days=cfg.time.startt, dto_seconds=cfg.time.dto,
        l_ocean=l_ocean_rep)
    diag.set_layout(layout)
    restart = RestartControl(f"{out}/restart_out",
                             cfg.output.ndt_per_restart, steps,
                             cfg.time.dto, cfg.time.startt)
    snapshot = jax.jit(lambda tree: jax.tree_util.tree_map(jnp.copy, tree))

    t_phys = t_diag = t_rst = 0.0
    t0 = time.perf_counter()
    for nt in range(1, steps + 1):
        time_days = (nt - 1) * cfg.time.dto / 86400.0
        if (nt - 1) % cfg.time.ndtocn == 0:
            st, frc = forcing_mod.update_fluxes(
                cfg, st, prm, frc, rep_flux(time_days),
                jnp.asarray(nt <= 1), model.grid.dm)
        need_full = diag.needs_full(nt) or restart.due(nt)
        tp = time.perf_counter()
        st = model.step(st, prm, frc, first_step=(nt <= 1),
                        with_diags=need_full)
        t_phys += time.perf_counter() - tp
        tp = time.perf_counter()
        diag.step(nt, st, prm, frc)
        t_diag += time.perf_counter() - tp
        tp = time.perf_counter()
        if restart.due(nt):
            restart.maybe_write(nt, snapshot(st), prm, frc,
                                fetch=layout.gather_tree)
        t_rst += time.perf_counter() - tp
    jax.block_until_ready(st)
    paths = diag.flush()
    written = restart.flush()
    wall = time.perf_counter() - t0
    ncs = [f for f in os.listdir(out) if f.endswith(".nc")]
    n_out = len(ncs)
    out_bytes = sum(os.path.getsize(os.path.join(out, f)) for f in ncs)
    return {
        "config": "ensemble10_dd", "ncol": nx * ny * n_members, "nz": nz,
        "steps": steps, "members": n_members,
        "output_bytes": out_bytes,
        "model_loop_s": round(wall, 2),
        "physics_s": round(t_phys, 2),
        "diag_s": round(t_diag, 2),
        "restart_s": round(t_rst, 2),
        "col_steps_per_s_wall": round(nx * ny * n_members * steps / wall, 1),
        "output_files": n_out,
        "restarts": len(written),
        "note": "library driver (ensemble.make_ensemble), ddmix on, "
                "full diagnostics (reference iodef streams over all "
                "members) + detached restarts",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--steps", type=int, default=72)
    ap.add_argument("--workdir", default="/tmp/bench_runs")
    ap.add_argument("--keep", action="store_true")
    a = ap.parse_args()
    os.makedirs(a.workdir, exist_ok=True)
    results = []
    for config in a.configs.split(","):
        try:
            if config == "ensemble10_dd":
                res = run_ensemble(a.workdir, a.steps)
            else:
                res = run_cli_config(config, a.workdir, a.steps)
        except Exception as e:
            res = {"config": config, "error": str(e)[:2000]}
        results.append(res)
        print(json.dumps(res), flush=True)
        if not a.keep:
            shutil.rmtree(os.path.join(a.workdir, config),
                          ignore_errors=True)
    path = os.path.join(ROOT, "BENCH_CONFIGS.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = {r["config"]: r for r in json.load(f)}
    for r in results:
        if "error" not in r:
            existing[r["config"]] = r
    with open(path, "w") as f:
        json.dump(list(existing.values()), f, indent=1)


if __name__ == "__main__":
    main()
