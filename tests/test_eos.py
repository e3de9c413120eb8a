"""EOS unit tests against the published UNESCO-1980 check values embedded in
the reference (mckpp_physics_state_equations.F90:24-25, 105-111)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mckpp_tpu.ops import eos


def test_cpsw_check_value():
    # CPSW = 3849.500 J/(kg degC) for S=40, T=40 degC, P0=10000 dbar
    v = float(eos.cpsw(40.0, 40.0, 10000.0))
    assert abs(v - 3849.500) < 0.05


def test_abk80_check_values_surface():
    # S=35, T=15 degC, P=0: alpha=2.14136e-4, beta=7.51638e-4, kappa=4.32576e-5
    alpha, beta, kappa, sig0, sig = eos.abk80(35.0, 15.0, 0.0)
    assert abs(float(alpha) - 2.14136e-4) < 1e-9
    assert abs(float(beta) - 7.51638e-4) < 1e-9
    assert abs(float(kappa) - 4.32576e-5) < 1e-10
    # sigma-t of standard seawater at 15C: ~25.97 kg/m^3
    assert abs(float(sig0) - 25.97) < 0.01
    assert float(sig) == float(sig0)


def test_abk80_check_values_depth():
    # S=40, T=0 degC, P=10000 dbar: alpha=2.69822e-4, beta=6.88317e-4,
    # kappa=3.55271e-5
    alpha, beta, kappa, _, sig = eos.abk80(40.0, 0.0, 10000.0)
    assert abs(float(alpha) - 2.69822e-4) < 1e-9
    assert abs(float(beta) - 6.88317e-4) < 1e-9
    assert abs(float(kappa) - 3.55271e-5) < 1e-10
    assert float(sig) > 50.0  # compressed deep water


def test_temperature_clamp():
    # T < -2 is clamped (reference :28-29)
    a1 = eos.abk80(35.0, -2.0, 0.0)
    a2 = eos.abk80(35.0, -10.0, 0.0)
    for x, y in zip(a1, a2):
        assert float(x) == float(y)


def test_vectorized_matches_scalar():
    s = jnp.asarray([35.0, 40.0, 30.0])
    t = jnp.asarray([15.0, 0.0, 25.0])
    p = jnp.asarray([0.0, 10000.0, 500.0])
    av, bv, kv, s0v, sv = eos.abk80(s, t, p)
    for i in range(3):
        a, b, k, s0, sg = eos.abk80(float(s[i]), float(t[i]), float(p[i]))
        np.testing.assert_allclose(float(av[i]), float(a), rtol=1e-14)
        np.testing.assert_allclose(float(sv[i]), float(sg), rtol=1e-14)


def test_density_monotonic_in_salinity():
    _, _, _, sig_a, _ = eos.abk80(34.0, 10.0, 0.0)
    _, _, _, sig_b, _ = eos.abk80(36.0, 10.0, 0.0)
    assert float(sig_b) > float(sig_a)
