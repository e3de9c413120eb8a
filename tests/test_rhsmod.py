"""Loop-oracle tests for the advection RHS corrections (rhsmod modes 1-7)
against the direct Fortran transliteration in tests/oracle_fortran.py.

Reference: mckpp_physics_solvers.F90:176-335.  Covers both scalars
(jsclr=1 heat, jsclr=2 salt), a range of mixed-layer indices km (the
km-dependent band walks of modes 6/7), and a stretched grid so layer
thicknesses vary with depth.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mckpp_tpu.grid import make_vertical_grid
from mckpp_tpu.ops.tridiag import rhsmod

import oracle_fortran as orc

NZ = 24
DTO = 1200.0


def _grid():
    return make_vertical_grid(NZ, 500.0, DTO, stretch=True, dscale=3.0,
                              dtype=jnp.float64)


def _cst(g):
    zm = np.zeros(NZ + 2)
    hm = np.zeros(NZ + 2)
    zm[1:] = np.asarray(g.zm, np.float64)
    hm[1:] = np.asarray(g.hm, np.float64)
    return dict(zm=zm, hm=hm)


def _fld(rng):
    rho = np.zeros(NZ + 2)
    cp = np.zeros(NZ + 2)
    rho[1:] = 1024.0 + rng.uniform(0, 4, NZ + 1)
    cp[1:] = 3990.0 + rng.uniform(0, 20, NZ + 1)
    return dict(rho=rho, cp=cp)


@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4, 5, 6, 7])
@pytest.mark.parametrize("jsclr", [1, 2])
@pytest.mark.parametrize("km", [2, 5, 13])
def test_rhsmod_modes_match_oracle(mode, jsclr, km):
    g = _grid()
    cst = _cst(g)
    rng = np.random.default_rng(42 + mode + 10 * jsclr + 100 * km)
    fld = _fld(rng)
    a_mag = 37.5 if jsclr == 1 else 2.4e-6

    rhs_f = np.zeros(NZ + 1)
    rhs_f[1:] = rng.standard_normal(NZ)
    rhs0 = rhs_f[1:].copy()

    dm_km = float(np.asarray(g.dm)[km])
    orc.rhsmod(jsclr, mode, a_mag, DTO, km, dm_km, NZ, rhs_f, fld, cst)

    got = rhsmod(jsclr, jnp.asarray(mode, jnp.int32), a_mag, DTO,
                 jnp.asarray(km, jnp.int32), jnp.asarray(dm_km),
                 jnp.asarray(rhs0), jnp.asarray(fld["rho"][1:]),
                 jnp.asarray(fld["cp"][1:]), g.hm, g.zm, NZ)

    np.testing.assert_allclose(np.asarray(got), rhs_f[1:],
                               rtol=1e-13, atol=1e-16,
                               err_msg=f"mode={mode} jsclr={jsclr} km={km}")
    if mode > 0:
        assert (np.asarray(got) != rhs0).any(), \
            f"mode={mode} made no change — vacuous comparison"


def test_rhsmod_mode4_shallow_column_noop_consistency():
    """Column shallower than 100 m: the reference's mode-4 search walks to
    the first level below 100 m; with none, behavior is degenerate — assert
    the framework applies no correction (documented deviation: the
    reference's unbounded '401' walk would read past the grid,
    mckpp_physics_solvers.F90:257-259)."""
    g = make_vertical_grid(10, 80.0, DTO, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    rhs0 = rng.standard_normal(10)
    got = rhsmod(2, jnp.asarray(4, jnp.int32), 1e-6, DTO,
                 jnp.asarray(3, jnp.int32), jnp.asarray(float(g.dm[3])),
                 jnp.asarray(rhs0), jnp.ones(10) * 1024.0,
                 jnp.ones(10) * 4000.0, g.hm, g.zm, 10)
    np.testing.assert_allclose(np.asarray(got), rhs0)
