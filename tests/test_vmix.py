"""Vertical-mixing internals: the reference-profile averaging (prefix-sum
form) is validated against a direct transcription of the reference's
sequential loop semantics (mckpp_physics_verticalmixing_mod.F90:110-137)."""

import jax.numpy as jnp
import numpy as np

from mckpp_tpu import constants as c
from mckpp_tpu.grid import make_vertical_grid


def loop_ref_avg(prof, zm, nz, epsilon=0.1):
    """Direct loop oracle for the surface-average reference value."""
    out = np.zeros(nz)
    for n in range(nz):                       # python level n (Fortran n+1)
        zref = epsilon * zm[n]
        wz = max(zm[0], zref)
        acc = prof[0] * wz / zref
        for kl in range(nz):                  # Fortran kl = kl_py+1
            if zref >= zm[kl]:
                break
            wz = min(zm[kl] - zm[kl + 1], zm[kl] - zref)
            dell = 0.5 * wz / (zm[kl] - zm[kl + 1])
            acc = acc - wz * (prof[kl] + dell * (prof[kl + 1] - prof[kl])) / zref
        out[n] = acc
    return out


def fast_ref_avg(prof, zm, nz, epsilon=0.1):
    """The production prefix-sum form (mirrors ops/vmix.py ref_avg)."""
    zm = jnp.asarray(zm)
    prof = jnp.asarray(prof)
    zref = epsilon * zm[:nz]
    wz0 = jnp.maximum(zm[0], zref)
    dz_lay = zm[:nz] - zm[1:nz + 1]
    kstar = jnp.searchsorted(-zm, -zref, side="left") - 1
    has = kstar >= 0
    ks = jnp.clip(kstar, 0, nz - 1)
    wz_p = zm[ks] - zref
    del_p = 0.5 * wz_p / dz_lay[ks]
    top = prof[0] * wz0 / zref
    tfull = dz_lay * 0.5 * (prof[:nz] + prof[1:nz + 1])
    csum = jnp.concatenate([jnp.zeros(1, dtype=tfull.dtype), jnp.cumsum(tfull)])
    partial = wz_p * (prof[ks] + del_p * (prof[ks + 1] - prof[ks]))
    contrib = jnp.where(has, csum[ks] + partial, 0.0)
    return np.asarray(top - contrib / zref)


def test_ref_avg_matches_loop_uniform_grid():
    nz = 30
    g = make_vertical_grid(nz=nz, dmax=300.0, dto=600.0)
    zm = np.asarray(g.zm)
    rng = np.random.default_rng(3)
    for _ in range(5):
        prof = rng.normal(size=nz + 1)
        np.testing.assert_allclose(fast_ref_avg(prof, zm, nz),
                                   loop_ref_avg(prof, zm, nz),
                                   rtol=1e-12, atol=1e-13)


def test_ref_avg_matches_loop_stretched_grid():
    nz = 40
    g = make_vertical_grid(nz=nz, dmax=1000.0, dto=1200.0,
                           stretch=True, dscale=4.0)
    zm = np.asarray(g.zm)
    rng = np.random.default_rng(4)
    prof = np.cumsum(rng.normal(size=nz + 1))     # smooth-ish profile
    np.testing.assert_allclose(fast_ref_avg(prof, zm, nz),
                               loop_ref_avg(prof, zm, nz),
                               rtol=1e-12, atol=1e-13)


def test_ref_avg_shallow_levels_passthrough():
    # zref above the first level centre: value equals the surface value
    nz = 10
    g = make_vertical_grid(nz=nz, dmax=100.0, dto=600.0)
    zm = np.asarray(g.zm)
    prof = np.linspace(1.0, 2.0, nz + 1)
    out = fast_ref_avg(prof, zm, nz)
    # level 0: zref = 0.1*zm[0] = -0.5 > zm[0] = -5 -> uref = prof[0]
    np.testing.assert_allclose(out[0], prof[0], rtol=1e-14)
