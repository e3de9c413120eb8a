"""Benchmark: columns/s/chip for the full KPP mixing + implicit-solve step.

Runs on the real TPU chip (ambient JAX_PLATFORMS=axon).  Prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's implied throughput lower bound of ~2,890
column-steps/s on a 64-core ARCHER2 node (144,507 columns x 72 steps in the
<=1h Slurm budget; BASELINE.md).  vs_baseline is the ratio of our measured
column-steps/s on ONE chip to that number.
"""

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ncol = int(os.environ.get("BENCH_NCOL", "16384"))
    nz = int(os.environ.get("BENCH_NZ", "69"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as ge

    model, st, prm, frc = ge._build(ncol=ncol, nz=nz, dtype=dtype)

    step = jax.jit(lambda s: model._step(s, prm, frc, jnp.asarray(False)),
                   donate_argnums=(0,))
    # warmup / compile
    st = step(st)
    jax.block_until_ready(st)
    st = step(st)
    jax.block_until_ready(st)

    t0 = time.perf_counter()
    for _ in range(steps):
        st = step(st)
    jax.block_until_ready(st)
    dt = time.perf_counter() - t0

    colsteps_per_s = ncol * steps / dt
    baseline = 2890.0
    print(json.dumps({
        "metric": "column_steps_per_s_per_chip",
        "value": round(colsteps_per_s, 1),
        "unit": f"column-steps/s ({dtype}, ncol={ncol}, nz={nz})",
        "vs_baseline": round(colsteps_per_s / baseline, 2),
    }))


if __name__ == "__main__":
    main()
