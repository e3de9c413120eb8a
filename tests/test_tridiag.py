"""Tridiagonal assembly/solve vs dense numpy reference, and rimix/ddmix."""

import jax.numpy as jnp
import numpy as np

from mckpp_tpu import constants as c
from mckpp_tpu.grid import make_vertical_grid
from mckpp_tpu.ops.tridiag import tridcof, tridrhs, tridmat, tridmat_pcr
from mckpp_tpu.ops.rimix import rimix, z121
from mckpp_tpu.ops.ddmix import ddmix


def _dense(cu, cc, cl):
    nz = len(cc)
    m = np.zeros((nz, nz))
    for i in range(nz):
        m[i, i] = cc[i]
        if i > 0:
            m[i, i - 1] = cu[i]
        if i < nz - 1:
            m[i, i + 1] = cl[i]
    return m


def test_tridiag_solve_matches_numpy():
    rng = np.random.default_rng(0)
    nz = 12
    g = make_vertical_grid(nz=nz, dmax=120.0, dto=600.0)
    diff = jnp.asarray(np.abs(rng.normal(1e-3, 5e-4, nz + 2)))
    cu, cc, cl = tridcof(diff, g.tri_dn, g.tri_up, nz)
    rhs = jnp.asarray(rng.normal(size=nz))
    yo = jnp.asarray(rng.normal(size=nz + 1))
    yn = tridmat(cu, cc, cl, rhs, yo)
    dense = _dense(np.asarray(cu), np.asarray(cc), np.asarray(cl))
    expect = np.linalg.solve(dense, np.asarray(rhs))
    np.testing.assert_allclose(np.asarray(yn[:nz]), expect, rtol=1e-12)
    assert float(yn[nz]) == float(yo[nz])


def test_pcr_matches_thomas_and_numpy():
    """The log-depth cyclic-reduction solve is the same system as Thomas."""
    rng = np.random.default_rng(7)
    for nz in (3, 12, 69):
        g = make_vertical_grid(nz=nz, dmax=10.0 * nz, dto=1200.0)
        diff = jnp.asarray(np.abs(rng.normal(5e-3, 2e-3, nz + 2)))
        cu, cc, cl = tridcof(diff, g.tri_dn, g.tri_up, nz)
        rhs = jnp.asarray(rng.normal(size=nz))
        yo = jnp.asarray(rng.normal(size=nz + 1))
        yn_t = tridmat(cu, cc, cl, rhs, yo)
        yn_p = tridmat_pcr(cu, cc, cl, rhs, yo)
        dense = _dense(np.asarray(cu), np.asarray(cc), np.asarray(cl))
        expect = np.linalg.solve(dense, np.asarray(rhs))
        np.testing.assert_allclose(np.asarray(yn_p[:nz]), expect, rtol=1e-11)
        np.testing.assert_allclose(np.asarray(yn_p), np.asarray(yn_t),
                                   rtol=1e-11, atol=1e-13)
        assert float(yn_p[nz]) == float(yo[nz])


def test_tridiag_diffusion_conserves_without_flux():
    # closed column, no surface flux, no ghat/ntflux: heat content conserved
    nz = 20
    g = make_vertical_grid(nz=nz, dmax=200.0, dto=1200.0)
    diff = jnp.full(nz + 2, 1e-3)
    diff = diff.at[0].set(0.0).at[nz].set(0.0).at[nz + 1].set(0.0)
    cu, cc, cl = tridcof(diff, g.tri_dn, g.tri_up, nz)
    rng = np.random.default_rng(1)
    yo = jnp.asarray(np.concatenate([rng.normal(15.0, 2.0, nz), [10.0]]))
    ghat = jnp.zeros(nz + 1)
    ntf = jnp.zeros(nz + 1)
    rhs = tridrhs(g.hm, yo, ntf, diff, ghat, 0.0, 0.0, 1200.0, g.tri_dn, nz)
    yn = tridmat(cu, cc, cl, rhs, yo)
    h_old = float((yo[:nz] * g.hm[:nz]).sum())
    h_new = float((yn[:nz] * g.hm[:nz]).sum())
    np.testing.assert_allclose(h_new, h_old, rtol=1e-12)
    # smoothing: variance must not increase
    assert float(jnp.var(yn[:nz])) <= float(jnp.var(yo[:nz])) + 1e-15


def test_tridrhs_surface_flux_sign():
    # positive sturflux (upward kinematic heat flux) cools the surface layer
    nz = 10
    g = make_vertical_grid(nz=nz, dmax=100.0, dto=600.0)
    diff = jnp.zeros(nz + 2)
    yo = jnp.full(nz + 1, 20.0)
    ghat = jnp.zeros(nz + 1)
    ntf = jnp.zeros(nz + 1)
    rhs = tridrhs(g.hm, yo, ntf, diff, ghat, 1e-4, 1e-4, 600.0, g.tri_dn, nz)
    assert float(rhs[0]) < 20.0
    np.testing.assert_allclose(np.asarray(rhs[1:]), 20.0)


def test_z121_plain_smoothing():
    v = jnp.zeros(7).at[3].set(0.4)      # inside [vlo, vhi] -> all weights 1
    out = z121(v, 0.0, 0.8)
    # neighbours of the spike get w*0.4/4, the spike 2*0.4/4
    np.testing.assert_allclose(float(out[3]), 0.4 * 2 / 4)
    np.testing.assert_allclose(float(out[2]), 0.4 / 4)
    np.testing.assert_allclose(float(out[4]), 0.4 / 4)


def test_z121_clipping_weights():
    # out-of-range neighbour gets weight 0 and is not mixed in
    v = jnp.asarray([0.0, 0.5, 5.0, 0.5, 0.0])   # vhi=0.8 -> v[2] clipped
    out = z121(v, 0.0, 0.8)
    # v[1]: neighbours v[0](w=0 edge), v[2](w=0 clipped): (2*0.5)/(0+2+0)=0.5
    np.testing.assert_allclose(float(out[1]), 0.5)
    # v[2] itself: (w1*0.5 + 2*5 + w3*0.5)/(1+2+1) = 11/4
    np.testing.assert_allclose(float(out[2]), (0.5 + 10.0 + 0.5) / 4)


def test_rimix_limits():
    nz = 16
    g = make_vertical_grid(nz=nz, dmax=160.0, dto=600.0)
    # strongly stable (large Ri): only background diffusivities
    dbloc = jnp.zeros(nz + 1).at[1:].set(1e-3)
    shsq = jnp.zeros(nz + 1).at[1:].set(1e-8)
    difm, difs, dift, rig = rimix(dbloc, shsq, g.zm)
    np.testing.assert_allclose(np.asarray(difm[1:nz + 1]), c.DIFMIW, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(difs[1:nz + 1]), c.DIFSIW, rtol=1e-10)
    # strongly sheared (Ri ~ 0): full shear-instability diffusivity
    dbloc0 = jnp.zeros(nz + 1)
    shsq0 = jnp.zeros(nz + 1).at[1:].set(1.0)
    difm0, difs0, _, rig0 = rimix(dbloc0, shsq0, g.zm)
    np.testing.assert_allclose(np.asarray(difm0[1:nz + 1]),
                               c.DIFMIW + c.DIFM0, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(rig0[1:]), 0.0, atol=1e-20)
    assert float(difm[0]) == 0.0


def test_ddmix_salt_fingering():
    nz = 8
    ad = jnp.zeros(nz + 1).at[1:].set(1.5e-4)
    bd = jnp.zeros(nz + 1).at[1:].set(1.0e-4)    # Rrho = 1.5 < 1.9
    difs = jnp.zeros(nz + 2)
    dift = jnp.zeros(nz + 2)
    difs2, dift2 = ddmix(ad, bd, difs, dift)
    rrho = 1.5
    dd = 1.0 - ((rrho - 1.0) / 0.9) ** 2
    expect = 1e-4 * dd ** 3
    np.testing.assert_allclose(np.asarray(difs2[1:nz + 1]), expect, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dift2[1:nz + 1]),
                               expect * 0.8 / rrho, rtol=1e-12)


def test_ddmix_diffusive_convection():
    nz = 8
    ad = jnp.zeros(nz + 1).at[1:].set(-2.0e-4)
    bd = jnp.zeros(nz + 1).at[1:].set(-1.0e-4)   # Rrho = 2 > 1, aDT < bDS
    difs = jnp.zeros(nz + 2)
    dift = jnp.zeros(nz + 2)
    difs2, dift2 = ddmix(ad, bd, difs, dift)
    rrho = 2.0
    dd = 1.5e-6 * 9.0 * 0.101 * np.exp(4.6 * np.exp(-0.54 * (1 / rrho - 1)))
    np.testing.assert_allclose(np.asarray(dift2[1:nz + 1]), dd, rtol=1e-12)
    prandtl = (1.85 - 0.85 / rrho) * rrho
    np.testing.assert_allclose(np.asarray(difs2[1:nz + 1]), prandtl * dd, rtol=1e-12)


def test_ddmix_no_regime():
    nz = 4
    ad = jnp.zeros(nz + 1).at[1:].set(1.0e-4)
    bd = jnp.zeros(nz + 1).at[1:].set(2.0e-4)    # stable-stable: no dd
    difs = jnp.full(nz + 2, 7.0)
    dift = jnp.full(nz + 2, 3.0)
    difs2, dift2 = ddmix(ad, bd, difs, dift)
    np.testing.assert_allclose(np.asarray(difs2), 7.0)
    np.testing.assert_allclose(np.asarray(dift2), 3.0)
