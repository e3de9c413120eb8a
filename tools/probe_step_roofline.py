"""Speed-of-light study of the SHIPPED whole-step Pallas kernel
(fused_pass._step_body / pass_impl="pallas_step") — VERDICT r4 item 1.

Three measurements, one verdict:

1. **Op census** of one fused pass (jaxpr traversal of `_pass_body`,
   col_lanes layout, production nz): per-element counts of simple VPU ops
   (add/mul/select/cmp), divides, sqrt-class, transcendentals (exp/pow)
   and MXU dot flops.
2. **Measured VPU rates** on THIS chip (micro-benchmarks: fused FMA
   chain, divide chain, exp chain, pow chain — all compute-bound
   elementwise loops), giving hardware speed-of-light per op class
   without trusting a spec sheet.
3. **Measured kernel times**: one fused pass (per-pass Pallas kernel)
   and the whole step (pallas_step, lazy + full), plus the HBM bytes of
   the step's true inputs/outputs.

Output: JSON with the census, the achievable-time decomposition
(sum over classes of count/rate), the HBM roofline, and %-of-achievable
for the shipped kernel.  Run on the real chip (ambient axon platform):

    python tools/probe_step_roofline.py [--ncol 16384] [--nz 69]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# 1. op census
# ---------------------------------------------------------------------------

SIMPLE = {"add", "sub", "mul", "max", "min", "select_n", "and", "or",
          "xor", "not", "eq", "ne", "lt", "le", "gt", "ge", "abs", "neg",
          "sign", "floor", "ceil", "round", "clamp", "convert_element_type"}
DIV = {"div", "rem"}
SQRT = {"sqrt", "rsqrt"}
TRANS = {"exp", "log", "pow", "tanh", "log1p", "expm1", "logistic",
         "cbrt", "exp2", "sin", "cos"}


def census_jaxpr(jaxpr, counts, mul=1):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim in ("pjit", "jit", "closed_call", "custom_jvp_call",
                    "custom_vjp_call", "remat", "remat2", "core_call"):
            inner = (eqn.params.get("jaxpr")
                     or eqn.params.get("call_jaxpr"))
            if inner is not None:
                census_jaxpr(getattr(inner, "jaxpr", inner), counts, mul)
            continue
        if prim in ("while", "scan", "cond"):
            # not present in _pass_body (loops are python-unrolled);
            # count bodies once if they appear
            for key in ("body_jaxpr", "cond_jaxpr", "jaxpr", "branches"):
                sub = eqn.params.get(key)
                if sub is None:
                    continue
                subs = sub if isinstance(sub, (tuple, list)) else [sub]
                for s in subs:
                    census_jaxpr(getattr(s, "jaxpr", s), counts, mul)
            continue
        nelem = 0
        for ov in eqn.outvars:
            shape = getattr(ov.aval, "shape", ())
            nelem += int(np.prod(shape)) if shape else 1
        if prim == "dot_general":
            a, b = eqn.invars[0].aval.shape, eqn.invars[1].aval.shape
            dims = eqn.params["dimension_numbers"][0][0]
            k = int(np.prod([a[d] for d in dims]))
            counts["mxu_flops"] = counts.get("mxu_flops", 0) + 2 * k * nelem * mul
            continue
        if prim == "integer_pow":
            y = eqn.params.get("y", 2)
            counts["simple"] = counts.get("simple", 0) + \
                nelem * mul * max(1, abs(int(y)) - 1)
            continue
        if prim in SIMPLE:
            cls = "simple"
        elif prim in DIV:
            cls = "div"
        elif prim in SQRT:
            cls = "sqrt"
        elif prim in TRANS:
            cls = "trans"
        elif prim in ("concatenate", "slice", "broadcast_in_dim",
                      "reshape", "transpose", "pad", "rev", "iota",
                      "squeeze", "dynamic_slice", "gather", "copy"):
            # VMEM data movement (z-shifts, lane copies): ~1 issue slot
            cls = "move"
        elif prim.startswith("reduce"):
            cls = "simple"        # log-depth tree adds
        else:
            cls = f"other:{prim}"
        counts[cls] = counts.get(cls, 0) + nelem * mul
    return counts


def pass_census(nz, block, wscale_mode="nodal"):
    from mckpp_tpu.grid import make_vertical_grid
    from mckpp_tpu.ops import fused_pass as fp

    grid = make_vertical_grid(nz, 1000.0, 1200.0, dtype=jnp.float32)
    flags = fp.PassFlags(wscale=wscale_mode)
    body = fp.make_fused_pass(grid, block, jnp.float32, flags, 1200.0,
                              full=False, impl="xla", zaxis=0)
    wz = nz + 2
    f32 = jnp.float32
    prof = jax.ShapeDtypeStruct((wz, block), f32)
    col = jax.ShapeDtypeStruct((fp.NSC, block), f32)
    row = jax.ShapeDtypeStruct((wz, 1), f32)
    aref = jax.ShapeDtypeStruct((wz, wz), f32)
    args = [prof] * 14 + [row] * 4 + [col] + [row] * 5 + [aref]
    # order: 12 profiles, swdk, swfrac, 4 forcing rows (dummies), colscal,
    # 5 grid rows, aref  -> but forcing dummies are (wz,1) rows here
    args = ([prof] * 14              # u..so, swdk, swfrac
            + [row] * 4              # ocnt, sal, fcorr_z, sfcorr_z dummies
            + [col]                  # colscal
            + [row] * 5              # zm hm dm tdn tup
            + [aref])
    jaxpr = jax.make_jaxpr(lambda *a: body(*a))(*args)
    counts = census_jaxpr(jaxpr.jaxpr, {})
    per_col = {k: v / block for k, v in counts.items()}
    return counts, per_col


# ---------------------------------------------------------------------------
# 2. measured per-class rates (micro-benchmarks, this chip)
# ---------------------------------------------------------------------------

def _rate(fn, x, iters_inner, flops_per_elem_iter, label, reps=3,
          calls=10):
    f = jax.jit(fn, donate_argnums=(0,))
    y = f(jnp.array(x, copy=True))      # donate a private copy, not x
    jax.block_until_ready(y)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(calls):          # amortize dispatch latency
            y = f(y)
        jax.block_until_ready(y)
        times.append((time.perf_counter() - t0) / calls)
    dt = float(np.median(times))
    n = y.size * iters_inner * flops_per_elem_iter
    return {"label": label, "s": dt, "ops_per_s": n / dt}


def measure_rates(n=8 * 1024 * 1024, k=192):
    """Per-class ceilings measured as XLA-compiled elementwise chains —
    the same execution regime as the kernel's VPU work.  Chains use
    RUNTIME operands (b, c arrays) so XLA cannot constant-fold them, and
    two independent chains per element expose ILP past the FMA latency."""
    x = jnp.linspace(0.5, 1.5, n, dtype=jnp.float32).reshape(8192, -1)
    b = (x * 1e-6 + 0.9999).astype(jnp.float32)
    c = (x * 1e-7).astype(jnp.float32)

    def two_chain(update, iters):
        def f(y):
            a2 = y * b
            yy = y
            for _ in range(iters // 2):
                yy = update(yy)
                a2 = update(a2)
            return yy + a2
        return f

    fma = two_chain(lambda y: y * b + c, k)
    div = two_chain(lambda y: b / (y + 1.0), k // 4)
    exp = two_chain(lambda y: jnp.exp(y * c), k // 8)
    pw = two_chain(lambda y: (y * y + b) ** (1.0 / 3.0), k // 8)
    sq = two_chain(lambda y: jnp.sqrt(y + b), k // 4)

    return {
        "fma": _rate(fma, x, k, 2, "fused mul-add (2 flops)"),
        "div": _rate(div, x, k // 4, 1, "divide"),
        "sqrt": _rate(sq, x, k // 4, 1, "sqrt"),
        "exp": _rate(exp, x, k // 8, 1, "exp"),
        "pow": _rate(pw, x, k // 8, 1, "pow (cube root)"),
    }


# ---------------------------------------------------------------------------
# 3. kernel timings + bytes
# ---------------------------------------------------------------------------

def measure_kernels(ncol, nz, wscale_mode="nodal", block=256):
    import __graft_entry__ as ge
    import dataclasses as dc

    out = {}
    for impl, key in (("pallas", "pass"), ("pallas_step", "step")):
        model, st, prm, frc = ge._build(ncol=ncol, nz=nz, dtype="float32",
                                        pass_impl=impl)
        if wscale_mode != "nodal":
            cfg = model.cfg
            cfg = dc.replace(cfg, physics=dc.replace(
                cfg.physics, wscale_mode=wscale_mode))
            from mckpp_tpu.models.column_model import KppModel
            model = KppModel(cfg)
        for wd in (False, True):
            step = jax.jit(lambda s: model._step(s, prm, frc,
                                                 jnp.asarray(False),
                                                 with_diags=wd),
                           donate_argnums=(0,))
            st = step(st)
            jax.block_until_ready(st)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(10):
                    st = step(st)
                jax.block_until_ready(st)
                times.append((time.perf_counter() - t0) / 10)
            out[f"{key}_{'full' if wd else 'lazy'}_ms"] = \
                round(float(np.median(times)) * 1e3, 3)
    return out


def step_bytes(ncol, nz):
    """True HBM traffic of one whole-step kernel call: 21 inputs + 9
    outputs in the col_lanes layout (fused_pass.make_fused_step)."""
    wz = nz + 2
    from mckpp_tpu.ops.fused_pass import NSC
    n_prof_in = 14          # u0..so, swdk, swfrac (forcing rows are dummies)
    n_prof_out = 8
    b = 4 * (n_prof_in * wz * ncol + NSC * ncol          # inputs
             + 5 * wz + wz * wz                          # grid rows + aref
             + n_prof_out * wz * ncol + 8 * ncol)        # outputs
    return b


# ---------------------------------------------------------------------------
# 4. XLA-optimized work census (cost_analysis of the fused-XLA step)
# ---------------------------------------------------------------------------

def xla_cost_analysis(ncol, nz, wscale_mode):
    """Flops / transcendentals / bytes of the OPTIMIZED HLO for the
    fused-XLA step body — semantically identical to the shipped Pallas
    kernel (bench.py parity gate: max rel diff 0.0), so its post-fusion
    cost model is a defensible work census where the raw jaxpr census
    (section 1) overcounts pre-CSE/DCE ops by ~6x."""
    import dataclasses as dc
    import __graft_entry__ as ge

    model, st, prm, frc = ge._build(ncol=ncol, nz=nz, dtype="float32",
                                    pass_impl="fused_xla")
    cfg = model.cfg
    cfg = dc.replace(cfg, physics=dc.replace(cfg.physics,
                                             wscale_mode=wscale_mode))
    from mckpp_tpu.models.column_model import KppModel
    model = KppModel(cfg)
    out = {}
    for wd in (False, True):
        f = jax.jit(lambda s: model._step(s, prm, frc, jnp.asarray(False),
                                          with_diags=wd))
        try:
            ca = f.lower(st).compile().cost_analysis()
        except Exception as e:                       # pragma: no cover
            return {"error": f"cost_analysis unavailable: {e}"}
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out["full" if wd else "lazy"] = {
            "gflops": round(ca.get("flops", 0.0) / 1e9, 3),
            "gtranscendentals": round(
                ca.get("transcendentals", 0.0) / 1e9, 3),
            "bytes_accessed_MB": round(
                ca.get("bytes accessed", 0.0) / 1e6, 1),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ncol", type=int, default=16384)
    ap.add_argument("--nz", type=int, default=69)
    ap.add_argument("--wscale", default="nodal")
    ap.add_argument("--skip-kernels", action="store_true")
    ap.add_argument("--skip-cost", action="store_true")
    a = ap.parse_args()

    counts, per_col = pass_census(a.nz, 256, a.wscale)
    print(json.dumps({"census_per_column_per_pass": {
        k: round(v, 1) for k, v in sorted(per_col.items())}}))

    rates = measure_rates()
    print(json.dumps({"measured_rates_Gops_s": {
        k: round(v["ops_per_s"] / 1e9, 1) for k, v in rates.items()}}))

    # achievable time for ONE pass over ncol columns, summing class costs
    # (VPU classes share the issue pipe, so costs add; MXU overlaps and is
    # negligible here)
    t_ach = 0.0
    decomp = {}
    for cls, rkey in (("simple", "fma"), ("move", "fma"), ("div", "div"),
                      ("sqrt", "sqrt"), ("trans", "exp")):
        n = counts.get(cls, 0) / 256 * a.ncol
        # simple ops: FMA chain measures 2 flops/elem; a generic simple op
        # is 1 issue slot, so the per-op rate is ops_per_s/2
        rate = rates[rkey]["ops_per_s"] / (2.0 if rkey == "fma" else 1.0)
        dt = n / rate
        decomp[cls] = round(dt * 1e3, 3)
        t_ach += dt
    mxu = counts.get("mxu_flops", 0) / 256 * a.ncol
    decomp["mxu_at_20Tflops"] = round(mxu / 20e12 * 1e3, 4)
    print(json.dumps({"achievable_pass_ms": round(t_ach * 1e3, 3),
                      "decomposition_ms": decomp}))

    sb = step_bytes(a.ncol, a.nz)
    print(json.dumps({"step_hbm_bytes_MB": round(sb / 1e6, 1),
                      "hbm_sol_ms_at_819GBs": round(sb / 819e9 * 1e3, 3)}))

    if not a.skip_cost:
        for mode in ("analytic", "nodal"):
            print(json.dumps({f"xla_cost_{mode}":
                              xla_cost_analysis(a.ncol, a.nz, mode)}))

    if not a.skip_kernels:
        kt = measure_kernels(a.ncol, a.nz, a.wscale)
        print(json.dumps(kt))
        passes_lazy = kt["step_lazy_ms"] / (t_ach * 1e3)
        print(json.dumps({
            "pass_vs_achievable": round(kt["pass_lazy_ms"] / (t_ach * 1e3), 2),
            "step_lazy_in_achievable_passes": round(passes_lazy, 2),
        }))


if __name__ == "__main__":
    main()
