"""Model-day drift vs the independent oracle at production shape
(VERDICT r2 weak item 7): 72 steps (1 model day at dto=1200 s) x nz=69
levels, f64, framework ocnstep vs the loop-for-loop NumPy transliteration
of the reference physics.  Records the accumulated-drift curve (printed,
copied into BASELINE.md) and asserts the day-end drift stays at
round-off-accumulation level — making the "parity blocked, use oracle"
argument quantitative at the reference's own resolution."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import test_oracle_trajectory as tt
import oracle_fortran as orc
from mckpp_tpu import forcing as forcing_mod

pytestmark = pytest.mark.slow

NZ = 69
NZP1 = NZ + 1
STEPS = 72
CHECKPOINTS = (6, 12, 24, 48, 72)


@pytest.fixture(autouse=True)
def production_shape(monkeypatch):
    monkeypatch.setattr(tt, "NZ", NZ)
    monkeypatch.setattr(tt, "NZP1", NZP1)


def rel_drift(got, want):
    scale = max(np.abs(want).max(), 1e-12)
    return float(np.abs(np.asarray(got, np.float64) - want).max() / scale)


def test_model_day_drift_nz69():
    model = tt.make_model()
    assert model.grid.nz == NZ
    st, prm, frc = tt.make_initial(model)
    cfg = model.cfg
    cst = tt.make_cst(model)
    flds = None
    curve = {}

    for nt in range(1, STEPS + 1):
        raw = forcing_mod.constant_test_fluxes(tt.NCOL, model.dtype)
        st, frc = forcing_mod.update_fluxes(
            cfg, st, prm, frc, raw, jnp.asarray(nt <= 1), model.grid.dm)
        if flds is None:
            flds = [tt.state_to_fld(st, prm, frc, i)
                    for i in range(tt.NCOL)]
        else:
            for i, fld in enumerate(flds):
                fld["sflux"][1:] = np.asarray(frc.sflux[i], np.float64)
                orc.ntflux(fld, cst, nt)
        st = model.step(st, prm, frc, first_step=(nt <= 1))
        for fld in flds:
            orc.ocnstep(fld, cst, nt)
            orc.check_profile(fld, cst)
        if nt in CHECKPOINTS:
            dT = max(rel_drift(st.x[i, :, 0], flds[i]["X"][1:, 1])
                     for i in range(tt.NCOL))
            dS = max(rel_drift(st.x[i, :, 1], flds[i]["X"][1:, 2])
                     for i in range(tt.NCOL))
            dU = max(rel_drift(st.u[i, :, 0], flds[i]["U"][1:, 1])
                     for i in range(tt.NCOL))
            dh = max(rel_drift(st.hmix[i], np.asarray(flds[i]["hmix"]))
                     for i in range(tt.NCOL))
            curve[nt] = (dT, dS, dU, dh)
            print(f"step {nt:3d}: relT={dT:.3e} relS={dS:.3e} "
                  f"relU={dU:.3e} relhmix={dh:.3e}")

    # hmix must agree exactly in discrete terms (same kmix) every column
    for i, fld in enumerate(flds):
        assert int(st.kmix[i]) == fld["kmix"], f"col {i} kmix diverged"
    dT, dS, dU, dh = curve[STEPS]
    # a model day of f64 round-off accumulation through ~450 nonlinear
    # passes; 1e-6 relative is ~3 orders above observed, far below any
    # physical signal
    assert dT < 1e-6 and dS < 1e-6 and dh < 1e-6
    assert dU < 1e-5          # currents have the smallest natural scale
