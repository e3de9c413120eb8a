"""Grid construction, wscale lookup tables, and shortwave absorption."""

import jax.numpy as jnp
import numpy as np

from mckpp_tpu import constants as c
from mckpp_tpu.grid import make_vertical_grid, coriolis
from mckpp_tpu.ops import wscale as ws
from mckpp_tpu.ops.swfrac import swfrac_levels, swdk, swfrac


def test_uniform_grid():
    g = make_vertical_grid(nz=10, dmax=100.0, dto=1200.0)
    np.testing.assert_allclose(np.asarray(g.hm[:10]), 10.0)
    np.testing.assert_allclose(float(g.hm[10]), 1e-10, rtol=1e-12)
    assert float(g.zm[10]) == -100.0
    np.testing.assert_allclose(float(g.zm[0]), -5.0)
    np.testing.assert_allclose(float(g.dm[10]), 100.0)
    assert float(g.dm[0]) == 0.0
    # tri factors: tri_dn[k] = dto/hm(k)/dzb(k)
    np.testing.assert_allclose(float(g.tri_dn[0]), 1200.0 / 10.0)
    np.testing.assert_allclose(float(g.tri_dn[1]), 1200.0 / 10.0 / 10.0)
    # bottom dzb(nz) = zm(nz)-zm(nzp1) = -95 - (-100) = 5
    np.testing.assert_allclose(float(g.tri_dn[10]), 1200.0 / 10.0 / 5.0)


def test_stretched_grid_sums_to_dmax():
    g = make_vertical_grid(nz=40, dmax=1000.0, dto=1200.0,
                           stretch=True, dscale=4.0)
    np.testing.assert_allclose(float(jnp.sum(g.hm[:40])), 1000.0, rtol=1e-12)
    # stretched: surface layers thinner than deep layers
    assert float(g.hm[0]) < float(g.hm[39])


def test_coriolis_floor():
    f = coriolis(jnp.asarray([0.0, 1.0, -1.0, 30.0, -30.0]))
    f25 = 2.0 * (c.TWOPI / c.SIDEREAL_DAY) * np.sin(np.deg2rad(2.5))
    np.testing.assert_allclose(float(f[1]), f25, rtol=1e-12)
    np.testing.assert_allclose(float(f[2]), -f25, rtol=1e-12)
    f30 = 2.0 * (c.TWOPI / c.SIDEREAL_DAY) * np.sin(np.deg2rad(30.0))
    np.testing.assert_allclose(float(f[3]), f30, rtol=1e-12)
    assert float(f[0]) == f25  # SIGN(1., 0.) = +1 in the reference


def test_wscale_table_nodes_match_formulas():
    wmt, wst = ws.build_tables()
    assert wmt.shape == (892, 50)
    # stable corner: zehat = 0 row is the last row (i = ni+1)
    # there zeta=0 -> wm = vonk*usta
    j = 30
    usta = c.WS_UMIN + (c.WS_UMAX - c.WS_UMIN) / (c.WS_NJ + 1) * j
    np.testing.assert_allclose(float(wmt[891, j]), c.VONK * usta, rtol=1e-12)
    # tables are positive and finite
    assert np.all(np.isfinite(np.asarray(wmt)))
    assert np.all(np.asarray(wst) >= 0.0)


def test_wscale_lookup_matches_table_nodes():
    wmt, wst = ws.build_tables()
    # pick an exact grid node: zehat = zmin + i*dz, ustar = umin + j*du
    i, j = 100, 20
    dz = (c.WS_ZMAX - c.WS_ZMIN) / (c.WS_NI + 1)
    du = (c.WS_UMAX - c.WS_UMIN) / (c.WS_NJ + 1)
    zehat = c.WS_ZMIN + dz * i
    ustar = c.WS_UMIN + du * j
    # choose sigma*hbl*bfsfc to produce that zehat: zehat = vonk*sigma*hbl*bfsfc
    sigma, hbl = 1.0, 50.0
    bfsfc = zehat / (c.VONK * sigma * hbl)
    wm, w_s = ws.wscale(jnp.float64(sigma), jnp.float64(hbl),
                        jnp.float64(ustar), jnp.float64(bfsfc), wmt, wst)
    np.testing.assert_allclose(float(wm), float(wmt[i, j]), rtol=1e-9)
    np.testing.assert_allclose(float(w_s), float(wst[i, j]), rtol=1e-9)


def test_wscale_stable_analytic_branch():
    wmt, wst = ws.build_tables()
    # zehat > 0 -> analytic formula
    sigma, hbl, ustar, bfsfc = 1.0, 30.0, 0.02, 1e-7
    zehat = c.VONK * sigma * hbl * bfsfc
    assert zehat > 0
    wm, w_s = ws.wscale(sigma, hbl, ustar, bfsfc, wmt, wst)
    ucube = ustar ** 3
    expect = c.VONK * ustar * ucube / (ucube + 5.0 * zehat)
    np.testing.assert_allclose(float(wm), expect, rtol=1e-12)
    np.testing.assert_allclose(float(w_s), expect, rtol=1e-12)


def test_swfrac_surface_is_one():
    v = swdk(jnp.asarray(0.0), 2)
    np.testing.assert_allclose(float(v), 1.0, rtol=1e-12)
    lv = swfrac_levels(1.0, jnp.asarray([-1.0, -10.0, -100.0]), 2)
    assert float(lv[0]) > float(lv[1]) > float(lv[2]) >= 0.0
    # type IB (index 2): rfac=0.67, a1=1.0, a2=17.0
    z = -10.0
    expect = 0.67 * np.exp(z / 1.0) + 0.33 * np.exp(z / 17.0)
    np.testing.assert_allclose(float(swdk(jnp.asarray(z), 2)), expect, rtol=1e-12)


def test_swfrac_deep_clipping():
    # clipped at exp(-80): very deep values match the rmin floor
    v = swfrac(1.0, jnp.asarray(-1.0e5), 0)
    expect = 0.58 * np.exp(-80.0) + 0.42 * np.exp(-80.0)
    np.testing.assert_allclose(float(v), expect, rtol=1e-12)


def test_cbrt_accuracy():
    """ops/wscale._cbrt (pow form — measured faster than a bit-trick
    Halley cbrt on the VPU, see its docstring) matches true cbrt to a few
    ulps in f32, handles signs and zero, and is exact-ish in f64."""
    import numpy as np
    import jax.numpy as jnp
    from mckpp_tpu.ops.wscale import _cbrt

    x = np.logspace(-30, 30, 100000).astype(np.float32)
    got = np.asarray(_cbrt(jnp.asarray(x)))
    want = np.cbrt(x.astype(np.float64))
    rel = np.abs(got - want) / want
    assert rel.max() < 1e-6, rel.max()
    neg = np.asarray(_cbrt(jnp.asarray(-x)))
    np.testing.assert_array_equal(neg, -got)
    assert float(_cbrt(jnp.asarray(0.0, jnp.float32))) == 0.0
    x64 = jnp.asarray([8.0, -27.0], jnp.float64)
    np.testing.assert_allclose(np.asarray(_cbrt(x64)), [2.0, -3.0],
                               rtol=1e-12)
