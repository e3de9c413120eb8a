"""Ensemble-as-column-replication tests (BASELINE.json config 5: N-member
perturbed-physics run).  Members are independent columns, so:

* an unperturbed member must reproduce the single-member trajectory
  bitwise (same kernels, same batch semantics);
* perturbed members diverge;
* the ensemble runs sharded over the virtual 8-device mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mckpp_tpu import ensemble
from mckpp_tpu.parallel import sharding as sh
from mckpp_tpu.parallel import distributed as dist
from mckpp_tpu import forcing as forcing_mod

import test_io


@pytest.mark.slow
def test_member0_bitwise_and_perturbed_diverge():
    model, st, prm, frc = test_io._build(ncol=4, nz=10)

    def perturb(m, key, s, p, f):
        x = s.x.at[:, :, 0].add(0.01 * m)
        return dataclasses.replace(s, x=x), p, f

    st_e, prm_e, frc_e = ensemble.make_ensemble(st, prm, frc, 3,
                                                perturb=perturb)
    assert st_e.u.shape[0] == 12

    out_single, _ = model.run(st, prm, frc, num_steps=3)
    out_e, _ = model.run(st_e, prm_e, frc_e, num_steps=3)

    m0 = ensemble.member_slice(out_e, 0, 4)
    np.testing.assert_array_equal(np.asarray(m0.x), np.asarray(out_single.x))
    np.testing.assert_array_equal(np.asarray(m0.hmix),
                                  np.asarray(out_single.hmix))
    m1 = ensemble.member_slice(out_e, 1, 4)
    assert not np.allclose(np.asarray(m1.x), np.asarray(out_single.x))

    mean, spread = ensemble.ensemble_mean_spread(out_e.hmix, 3)
    assert mean.shape == (4,) and spread.shape == (4,)


def test_ensemble_sharded_over_mesh():
    model, st, prm, frc = test_io._build(ncol=4, nz=10)
    st_e, prm_e, frc_e = ensemble.make_ensemble(st, prm, frc, 4)
    mesh = sh.make_mesh()
    layout = dist.make_layout(16, mesh)
    st_s = layout.shard_tree(st_e)
    prm_s = layout.shard_tree(prm_e)
    frc_s = layout.shard_tree(frc_e)
    step = sh.make_sharded_step(model, mesh)
    out = step(st_s, prm_s, frc_s, jnp.asarray(False))
    out_ref = model.step(st_e, prm_e, frc_e, first_step=False)
    np.testing.assert_allclose(layout.gather(out.hmix)[:16],
                               np.asarray(out_ref.hmix), rtol=0, atol=0)
