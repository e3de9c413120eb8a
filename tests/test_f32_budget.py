"""Production-precision (float32) error budget (VERDICT r3 item 1).

The reference's precision contract is float64 (-fdefault-real-8,
fcm-make-gfortran-local.cfg:5); the TPU production mode is float32 (the
headline throughput numbers).  This test quantifies what that trade costs:
the SAME production step path (fused pass, PCR solver, nodal wscale) is run
for 72 steps (1 model day at dto=1200 s) at nz=69 in f32 and f64 on
identical inputs, and the per-field trajectory divergence is recorded at
steps 6/12/24/48/72 (the curve lives in BASELINE.md next to the f64-vs-
oracle curve) and bounded here.

Drift is reported two ways:

* ``rel``: max-abs divergence normalized by the field's max magnitude —
  the same metric as the f64 oracle-drift curve;
* ``phys``: max-abs divergence in physical units (degC / psu / m s^-1 / m)
  — what a scientist compares against instrument/forcing uncertainty.

hmix is intrinsically discrete at f32: a borderline bulk-Richardson
crossing can move the diagnosed boundary-layer level by one, jumping hmix
by a layer thickness.  The budget therefore bounds hmix divergence by the
local layer thickness, not by round-off.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import test_oracle_trajectory as tt
from mckpp_tpu import forcing as forcing_mod
from mckpp_tpu.models.column_model import KppModel

pytestmark = pytest.mark.slow

NZ = 69
NZP1 = NZ + 1
STEPS = 72
CHECKPOINTS = (6, 12, 24, 48, 72)


@pytest.fixture(autouse=True)
def production_shape(monkeypatch):
    monkeypatch.setattr(tt, "NZ", NZ)
    monkeypatch.setattr(tt, "NZP1", NZP1)


def make_production_model(dtype):
    """The production step semantics (fused body, PCR, nodal wscale) at the
    requested precision — NOT the reference-order thomas/table path, so the
    comparison isolates precision, holding the algorithm fixed."""
    from mckpp_tpu import KppConfig, DomainConfig, TimeConfig
    from mckpp_tpu.config import PhysicsFlags
    cfg = KppConfig(
        domain=DomainConfig(nx=tt.NCOL, ny=1, nz=NZ, dmax=200.0),
        time=TimeConfig(dtsec=1200.0, ndtocn=1, startt=0.0, finalt=1.0),
        physics=PhysicsFlags(solver="pcr", wscale_mode="nodal",
                             pass_impl="fused_xla"),
        dtype=dtype)
    return KppModel(cfg)


def run_day(model):
    st, prm, frc = tt.make_initial(model)
    cfg = model.cfg
    out = {}
    for nt in range(1, STEPS + 1):
        raw = forcing_mod.constant_test_fluxes(tt.NCOL, model.dtype)
        st, frc = forcing_mod.update_fluxes(
            cfg, st, prm, frc, raw, jnp.asarray(nt <= 1), model.grid.dm)
        st = model.step(st, prm, frc, first_step=(nt <= 1))
        if nt in CHECKPOINTS:
            out[nt] = {
                "T": np.asarray(st.x[..., 0], np.float64),
                "S": np.asarray(st.x[..., 1], np.float64),
                "U": np.asarray(st.u[..., 0], np.float64),
                "hmix": np.asarray(st.hmix, np.float64),
                "kmix": np.asarray(st.kmix),
            }
    return out


def test_f32_production_drift_vs_f64_nz69():
    m64 = make_production_model("float64")
    m32 = make_production_model("float32")
    r64 = run_day(m64)
    r32 = run_day(m32)

    hm = np.asarray(m64.grid.hm, np.float64)
    curve = {}
    for nt in CHECKPOINTS:
        row = {}
        for f in ("T", "S", "U", "hmix"):
            a, b = r32[nt][f], r64[nt][f]
            scale = max(np.abs(b).max(), 1e-12)
            row[f] = (float(np.abs(a - b).max() / scale),     # rel
                      float(np.abs(a - b).max()))             # phys
        row["dkmix"] = int(np.abs(r32[nt]["kmix"].astype(np.int64)
                                  - r64[nt]["kmix"].astype(np.int64)).max())
        curve[nt] = row
        print(f"step {nt:3d}: "
              + " ".join(f"{f}: rel={row[f][0]:.3e} phys={row[f][1]:.3e}"
                         for f in ("T", "S", "U", "hmix"))
              + f" dkmix={row['dkmix']}")

    end = curve[STEPS]
    # physical-units budget after one model day (bounds ~10x observed;
    # the measured values are recorded in BASELINE.md):
    assert end["T"][1] < 0.05      # degC — far below forcing uncertainty
    assert end["S"][1] < 0.01      # psu
    assert end["U"][1] < 0.02      # m/s
    # hmix: discrete by nature — the f32 boundary-layer level may differ
    # by at most one, so divergence is bounded by the thickest local layer
    assert end["dkmix"] <= 1
    kmax = max(int(r64[STEPS]["kmix"].max()), int(r32[STEPS]["kmix"].max()))
    assert end["hmix"][1] <= hm[:min(kmax + 1, NZ)].max() + 1e-6
