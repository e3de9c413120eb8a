"""Pin the documented extra_iters deviation.

The reference's hmix convergence loop continues UNBOUNDED past itermax
while the boundary layer keeps deepening (hmixn > hmixe,
mckpp_physics_ocnstep_mod.F90:176-181).  The framework caps those
post-itermax deepening passes at ``extra_iters`` (config.py PhysicsFlags)
because a jitted while_loop must not be able to spin forever on a single
pathological column.  This test constructs a column whose hmix deepens for
many passes (convective forcing + tiny hmixtolfrac + tiny itermax), shows
the reference-semantics oracle runs far past itermax, and asserts:

* with a generous cap the framework matches the oracle exactly, and
* with a small cap the trajectory differs (the cap genuinely binds) while
  remaining finite and stable.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import test_oracle_trajectory as tj
import oracle_fortran as orc
from mckpp_tpu import forcing as forcing_mod


def _run(model, n_steps, raw_fn):
    st, prm, frc = tj.make_initial(model)
    cfg = model.cfg
    for nt in range(1, n_steps + 1):
        st, frc = forcing_mod.update_fluxes(
            cfg, st, prm, frc, raw_fn(nt), jnp.asarray(nt <= 1),
            model.grid.dm)
        st = model.step(st, prm, frc, first_step=(nt <= 1))
    return st, prm, frc


def convective(nt):
    raw = forcing_mod.constant_test_fluxes(tj.NCOL)
    # strong surface cooling, no sun: convection deepens hmix every pass
    return raw._replace(swf=jnp.zeros(tj.NCOL),
                        lhf=jnp.full((tj.NCOL,), -900.0),
                        taux=jnp.full((tj.NCOL,), 0.2))


ITERMAX = 4
TOLFRAC = 1e-7          # convergence effectively unreachable


@pytest.mark.slow
def test_extra_iters_cap_binds_and_matches_unbounded_reference():
    # oracle with the reference's unbounded deepening branch
    model = tj.make_model(itermax=ITERMAX, hmixtolfrac=TOLFRAC,
                          extra_iters=400)
    st, prm, frc = tj.make_initial(model)
    cst = tj.make_cst(model)
    st, frc = forcing_mod.update_fluxes(
        model.cfg, st, prm, frc, convective(1), jnp.asarray(True),
        model.grid.dm)
    flds = [tj.state_to_fld(st, prm, frc, i) for i in range(tj.NCOL)]
    st1 = model.step(st, prm, frc, first_step=True)
    niters = []
    for i, fld in enumerate(flds):
        orc.ocnstep(fld, cst, 1)
        orc.check_profile(fld, cst)
        niters.append(fld["niter"])
    # the unbounded branch genuinely ran past itermax
    assert max(niters) > ITERMAX + 2, \
        f"deepening branch not exercised (iters={niters})"
    # generous cap == reference-unbounded semantics
    for i, fld in enumerate(flds):
        tj.compare_column(st1, i, fld, 1)

    # small cap: trajectory must differ for the long-iterating column but
    # stay finite (the cap's purpose)
    model_cap = tj.make_model(itermax=ITERMAX, hmixtolfrac=TOLFRAC,
                              extra_iters=1)
    st_c, prm_c, frc_c = tj.make_initial(model_cap)
    st_c, frc_c = forcing_mod.update_fluxes(
        model_cap.cfg, st_c, prm_c, frc_c, convective(1), jnp.asarray(True),
        model_cap.grid.dm)
    st1_c = model_cap.step(st_c, prm_c, frc_c, first_step=True)
    assert np.all(np.isfinite(np.asarray(st1_c.x)))
    long_cols = [i for i, n in enumerate(niters) if n > ITERMAX + 1 + 1]
    assert long_cols, "no column iterated past the small cap"
    i = long_cols[0]
    assert not np.allclose(np.asarray(st1_c.hmix[i]), flds[i]["hmix"],
                           rtol=1e-12), \
        "extra_iters cap made no difference — deviation untestable"
