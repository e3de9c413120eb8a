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


def _parity_one(ge, ncol, nz, pad: bool):
    """One step of the PRODUCTION kernel vs the fused-XLA body on
    identical inputs.  ``pad=True`` routes both through the CLI's padded
    layout (odd production column counts)."""
    model_p, st_p, prm, frc = ge._build(ncol=ncol, nz=nz, dtype="float32")
    model_x, st_x, _, _ = ge._build(ncol=ncol, nz=nz, dtype="float32",
                                    pass_impl="fused_xla")
    if pad:
        from mckpp_tpu.parallel import sharding as shard
        from mckpp_tpu.parallel import distributed as dist
        mesh = shard.make_mesh(jax.devices()[:1])
        layout = dist.make_layout(
            ncol, mesh, pad_multiple=model_p.cfg.physics.pass_block)
        stp = layout.shard_tree(st_p)
        prm_p = layout.shard_tree(prm)
        frc_p = layout.shard_tree(frc)
        step = shard.make_sharded_step(model_p, mesh)
        out_p = layout.gather_tree(
            step(stp, prm_p, frc_p, jnp.asarray(False)))
        out_x = model_x.step(st_x, prm, frc, first_step=False)
    else:
        out_p = model_p.step(st_p, prm, frc, first_step=False)
        out_x = model_x.step(st_x, prm, frc, first_step=False)
    diffs = {}
    for name in ("x", "u", "hmix", "difm", "dift"):
        a = np.asarray(getattr(out_p, name), np.float64)
        b = np.asarray(getattr(out_x, name), np.float64)
        scale = max(np.abs(b).max(), 1e-6)
        diffs[name] = float(np.abs(a - b).max() / scale)
    return model_p.pass_impl, diffs


def parity_check(ge, nz):
    """On-chip correctness oracle over MULTIPLE shapes: the production
    kernel (whole-step Pallas since r4) vs the fused-XLA body — the bench
    shape, a different (ncol, nz), and an odd ncol through the CLI's
    padded layout (compiled-Mosaic behavior is shape-dependent; ADVICE
    r4).  Prints max rel diffs to stderr and aborts the bench on any
    disagreement (so a perf number is never recorded for a wrong
    kernel)."""
    if jax.devices()[0].platform not in ("tpu", "axon"):
        return
    shapes = [(512, nz, False), (256, 40, False), (300, 33, True)]
    if os.environ.get("BENCH_PARITY_FAST", "0") == "1":
        shapes = shapes[:1]
    impl = None
    for ncol_s, nz_s, pad in shapes:
        impl, diffs = _parity_one(ge, ncol_s, nz_s, pad)
        print(json.dumps({
            "parity_pallas_vs_fused_xla_max_rel_diff": diffs,
            "shape": f"ncol={ncol_s} nz={nz_s}{' padded' if pad else ''}"}),
            file=sys.stderr)
        bad = {k: v for k, v in diffs.items() if v > 1e-5}
        assert not bad, (f"Pallas kernel disagrees with fused-XLA body at "
                         f"ncol={ncol_s} nz={nz_s} pad={pad}: {bad}")
    print(json.dumps({"production_impl": impl}), file=sys.stderr)


def main():
    ncol = int(os.environ.get("BENCH_NCOL", "16384"))
    nz = int(os.environ.get("BENCH_NZ", "69"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as ge

    if os.environ.get("BENCH_SKIP_PARITY", "0") != "1":
        parity_check(ge, nz)

    model, st, prm, frc = ge._build(ncol=ncol, nz=nz, dtype=dtype)

    def time_step(with_diags):
        """Median + spread over ``repeats`` timed blocks of ``steps`` steps
        each (run-to-run tunnel dispatch noise on the dev box is ~5%;
        a single block cannot distinguish it from a real regression —
        VERDICT r3 weak #2)."""
        nonlocal st
        step = jax.jit(
            lambda s: model._step(s, prm, frc, jnp.asarray(False),
                                  with_diags=with_diags),
            donate_argnums=(0,))
        st = step(st)                  # warmup / compile
        jax.block_until_ready(st)
        st = step(st)
        jax.block_until_ready(st)
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(steps):
                st = step(st)
            jax.block_until_ready(st)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        spread = (max(times) - min(times)) / med
        return med, spread, times

    dt, spread, times = time_step(with_diags=True)
    colsteps_per_s = ncol * steps / dt
    # secondary: the diagnostics-lazy step (bitwise-identical prognostic
    # trajectory, materialization pass skipped — what steps cost when no
    # output stream samples a wide field; see ops/ocnstep_fused.py)
    dt_lazy, spread_lazy, _ = time_step(with_diags=False)
    print(json.dumps({
        "prognostic_only_column_steps_per_s": round(ncol * steps / dt_lazy, 1),
        "full_step_ms": round(dt / steps * 1e3, 3),
        "prognostic_step_ms": round(dt_lazy / steps * 1e3, 3),
        "prognostic_spread": round(spread_lazy, 4),
        "block_times_s": [round(t, 4) for t in times],
    }), file=sys.stderr)
    if spread > 0.10:
        print(f"WARNING: run-to-run spread {spread:.1%} exceeds 10% — "
              f"treat the median as noisy (block times: "
              f"{[round(t, 3) for t in times]})", file=sys.stderr)

    baseline = 2890.0
    print(json.dumps({
        "metric": "column_steps_per_s_per_chip",
        "value": round(colsteps_per_s, 1),
        "unit": f"column-steps/s ({dtype}, ncol={ncol}, nz={nz}, "
                f"median of {repeats}x{steps}-step blocks)",
        "vs_baseline": round(colsteps_per_s / baseline, 2),
        "median_step_ms": round(dt / steps * 1e3, 3),
        "spread": round(spread, 4),
        "noisy": bool(spread > 0.10),
    }))


if __name__ == "__main__":
    main()
