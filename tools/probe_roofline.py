"""Fused-pass roofline probe (run on the real TPU chip).

Times one fast pass, one full pass, the mask-merge overhead, and the whole
step at the bench shape; reports bytes moved vs HBM speed-of-light and the
implied passes/step.  Results feed BASELINE.md's roofline table.

Usage: python tools/probe_roofline.py [ncol] [nz]
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from mckpp_tpu.ops import fused_pass as fp
from mckpp_tpu.ops.ocnstep_fused import pass_flags


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ncol = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    nz = int(sys.argv[2]) if len(sys.argv) > 2 else 69
    dtype = jnp.float32
    model, st, prm, frc = ge._build(ncol=ncol, nz=nz, dtype="float32")
    wz = nz + 2
    flags = pass_flags(model.cfg)
    dto = model.cfg.time.dto
    grid = model.grid

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    impl = "pallas" if on_tpu else "xla"
    fast = fp.make_fused_pass(grid, ncol, dtype, flags, dto,
                              full=False, impl=impl, block=128)
    fullp = fp.make_fused_pass(grid, ncol, dtype, flags, dto,
                               full=True, impl=impl, block=128)

    rng = np.random.default_rng(0)
    prof = lambda: jnp.asarray(rng.standard_normal((ncol, wz)) * 0.01 + 15.0,
                               dtype)
    u, v, t, s = prof(), prof(), prof(), prof()
    ux, vx, tx, sx = prof(), prof(), prof(), prof()
    uo, vo, to, so = prof(), prof(), prof(), prof()
    swdk = jnp.asarray(rng.uniform(0, 1, (ncol, wz)), dtype)
    swfrac = jnp.asarray(rng.uniform(0, 1, (ncol, wz)), dtype)
    dummy = jnp.zeros((1, wz), dtype)
    colscal = jnp.asarray(rng.uniform(0.1, 1, (ncol, fp.NSC)), dtype)
    zm_r = jnp.asarray(np.pad(np.asarray(grid.zm), (0, 1)), dtype)[None]
    hm_r = jnp.asarray(np.pad(np.asarray(grid.hm), (0, 1),
                              constant_values=1.0), dtype)[None]
    dm_r = jnp.asarray(np.pad(np.asarray(grid.dm), (0, 1)), dtype)[None]
    tdn_r = jnp.asarray(np.pad(np.asarray(grid.tri_dn), (0, 1)), dtype)[None]
    tup_r = jnp.asarray(np.pad(np.asarray(grid.tri_up), (0, 1)), dtype)[None]
    aref = jnp.asarray(fp.build_ref_matrix(np.asarray(grid.zm), wz), dtype)

    args = (u, v, t, s, ux, vx, tx, sx, uo, vo, to, so, swdk, swfrac,
            dummy, dummy, dummy, dummy, colscal, zm_r, hm_r, dm_r,
            tdn_r, tup_r, aref)

    fast_j = jax.jit(lambda *a: fast(*a))
    full_j = jax.jit(lambda *a: fullp(*a))
    t_fast = timeit(fast_j, *args)
    t_full = timeit(full_j, *args)

    # the convergence-loop body = fast pass + 8 masked carries (what the
    # while_loop actually pays per iteration)
    cont = jnp.asarray(rng.uniform(0, 1, (ncol,)) > 0.1)

    @jax.jit
    def body_like(u, v, t, s, ux, vx, tx, sx, cont):
        outs = fast(u, v, t, s, ux, vx, tx, sx, uo, vo, to, so, swdk,
                    swfrac, dummy, dummy, dummy, dummy, colscal, zm_r,
                    hm_r, dm_r, tdn_r, tup_r, aref)
        m = lambda a, b: jnp.where(cont[:, None], a, b)
        return (m(outs[0], u), m(outs[1], v), m(outs[2], t), m(outs[3], s),
                m(outs[4], ux), m(outs[5], vx), m(outs[6], tx), m(outs[7], sx))

    t_body = timeit(body_like, u, v, t, s, ux, vx, tx, sx, cont)

    # whole step at the same shape
    step = jax.jit(lambda s_: model._step(s_, prm, frc, jnp.asarray(False)))
    t_step = timeit(step, st, n=10)

    # bytes moved by one fast pass: 14 column profiles in + colscal in,
    # 8 profiles + colout out (f32)
    bytes_fast = (14 * ncol * wz + ncol * fp.NSC
                  + 8 * ncol * wz + ncol * 8) * 4
    hbm_gbs = 819.0       # TPU v5e HBM bandwidth
    sol_fast = bytes_fast / (hbm_gbs * 1e9)

    print(json.dumps({
        "ncol": ncol, "nz": nz, "impl": impl,
        "t_fast_pass_ms": round(t_fast * 1e3, 4),
        "t_full_pass_ms": round(t_full * 1e3, 4),
        "t_body_with_merge_ms": round(t_body * 1e3, 4),
        "merge_overhead_ms": round((t_body - t_fast) * 1e3, 4),
        "t_step_ms": round(t_step * 1e3, 4),
        "implied_passes_per_step": round(t_step / t_fast, 2),
        "bytes_fast_MB": round(bytes_fast / 1e6, 2),
        "sol_fast_ms_at_819GBs": round(sol_fast * 1e3, 4),
        "fast_vs_sol": round(t_fast / sol_fast, 1),
        "col_steps_per_s": round(ncol / t_step, 1),
    }, indent=1))


if __name__ == "__main__":
    main()
