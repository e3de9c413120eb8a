"""Weak-scaling harness: fixed columns-per-device, growing device count.

The reference's parallel story is OpenMP over columns on one node
(run/KPPocean.slurm:5-20) with MPI-over-columns as the stated direction
(README.md:3-5); the TPU-native equivalent is the 1-D column mesh.  Columns
are independent, so ideal weak scaling is flat step time; this harness
measures the real curve (sharding overhead, the any-column-active
all-reduce in the convergence loop) and prints one JSON line per device
count plus a summary line with the weak-scaling efficiency (north-star
target > 80%, BASELINE.md).

Usage:
  python bench_scaling.py [--cols-per-device N] [--nz N] [--steps N]
  # virtual 8-device CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_scaling.py --cols-per-device 512
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

if os.environ.get("JAX_PLATFORMS", "").lower().startswith("cpu"):
    import jax
    from jax._src import xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
import numpy as np


def build(ncol, nz, dtype="float32"):
    from mckpp_tpu import KppConfig, DomainConfig, TimeConfig, KppModel
    from mckpp_tpu.grid import coriolis
    from mckpp_tpu.state import init_params
    from mckpp_tpu import forcing as forcing_mod

    cfg = KppConfig(domain=DomainConfig(nx=ncol, ny=1, nz=nz, dmax=1000.0),
                    time=TimeConfig(dtsec=3600.0, ndtocn=3),
                    dtype=dtype)
    model = KppModel(cfg)
    nzp1 = nz + 1
    zm = np.asarray(model.grid.zm)
    rng = np.random.default_rng(0)
    t0 = 20.0 + 8.0 * np.exp(zm / 80.0) + 0.5 * rng.standard_normal((ncol, 1))
    s0 = np.tile(35.0 - 0.4 * np.exp(zm / 120.0), (ncol, 1))
    u0 = np.zeros((ncol, nzp1, 2))
    prm = init_params(ncol, nzp1, dtype=model.dtype)
    lat = jnp.linspace(-60.0, 60.0, ncol, dtype=model.dtype)
    prm = dataclasses.replace(prm, f=coriolis(lat), dlat=lat)
    st, prm, frc = model.warm_start(jnp.asarray(u0), jnp.asarray(t0),
                                    jnp.asarray(s0), prm)
    raw = forcing_mod.constant_test_fluxes(ncol, model.dtype)
    st, frc = forcing_mod.update_fluxes(cfg, st, prm, frc, raw,
                                        jnp.asarray(True), model.grid.dm)
    return model, st, prm, frc


def time_steps(model, st, prm, frc, mesh, steps, diagnostics=False,
               outdir=None):
    """Per-step time over the sharded mesh; with ``diagnostics`` a
    DiagnosticsManager with reference-shaped streams (T/S/hmix 3-hourly
    mean + a 9-step all-field instant window) accumulates on the sharded
    arrays — the flat-vs-no-diagnostics comparison shows the output path
    performs no per-step gathers (VERDICT r2 item 2 done-criterion)."""
    from mckpp_tpu.parallel import sharding as sh
    from mckpp_tpu.parallel import distributed as dist

    ncol = st.u.shape[0]
    layout = dist.make_layout(ncol, mesh)
    st = layout.shard_tree(st)
    prm = layout.shard_tree(prm)
    frc = layout.shard_tree(frc)
    step = sh.make_sharded_step(model, mesh)
    dm = None
    if diagnostics:
        from mckpp_tpu.io.diagnostics import DiagnosticsManager, Stream
        dm = DiagnosticsManager(
            [Stream("scal_mean", "average", 9, fields=("T", "S", "hmix")),
             Stream("scal_all", "instant", 9)],
            nx=ncol, ny=1, zm=model.grid.zm,
            outdir=outdir or "/tmp/bench_scaling_out",
            dto_seconds=model.cfg.time.dto, async_write=True)
        dm.set_layout(layout)
    first = jnp.asarray(False)
    # warm through one full emit window: compiles both with_diags step
    # variants and both extraction subsets (reduced-only + emit set)
    warm = 10 if dm is not None else 1
    for nt in range(1, warm + 1):
        wd = dm.needs_full(nt) if dm is not None else True
        st = step(st, prm, frc, first, with_diags=wd)
        if dm is not None:
            dm.step(nt, st, prm, frc)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    for nt in range(warm + 1, warm + steps + 1):
        wd = dm.needs_full(nt) if dm is not None else True
        st = step(st, prm, frc, first, with_diags=wd)
        if dm is not None:
            dm.step(nt, st, prm, frc)
    jax.block_until_ready(st)
    dt = (time.perf_counter() - t0) / steps
    if dm is not None:
        dm.flush()
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cols-per-device", type=int, default=2048)
    ap.add_argument("--nz", type=int, default=69)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--diagnostics", action="store_true",
                    help="also time each device count with sharded "
                         "diagnostic streams accumulating (flat vs bare "
                         "= no per-step gathers)")
    args = ap.parse_args()

    from mckpp_tpu.parallel import sharding as sh

    devices = jax.devices()
    counts = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= len(devices)]
    results = []
    for n in counts:
        mesh = sh.make_mesh(devices[:n])
        ncol = args.cols_per_device * n
        model, st, prm, frc = build(ncol, args.nz, args.dtype)
        dt = time_steps(model, st, prm, frc, mesh, args.steps)
        thr = ncol / dt
        results.append((n, dt, thr))
        line = {
            "metric": "weak_scaling_step_time", "devices": n,
            "ncol": ncol, "value": dt, "unit": "s/step",
            "column_steps_per_s": thr}
        if args.diagnostics:
            model, st, prm, frc = build(ncol, args.nz, args.dtype)
            dt_d = time_steps(model, st, prm, frc, mesh, args.steps,
                              diagnostics=True)
            line["value_with_diagnostics"] = dt_d
            line["diag_overhead_frac"] = round(dt_d / dt - 1.0, 4)
        print(json.dumps(line), flush=True)

    t1 = results[0][1]
    eff = t1 / results[-1][1] if results else 0.0
    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "value": round(eff, 4), "unit": f"t(1dev)/t({results[-1][0]}dev), "
        f"{args.cols_per_device} cols/device",
        "vs_baseline": round(eff / 0.8, 3)}), flush=True)


if __name__ == "__main__":
    main()
