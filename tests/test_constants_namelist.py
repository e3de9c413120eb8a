"""NAME_CONSTANTS threading: the 15 reference-overridable physical
constants (mckpp_initialize_namelist_mod.F90:92-107, copied into the model
at mckpp_initialize_constants_mod.F90:5-153) must flow from the namelist
into the physics — a run setting ``vonk=0.41`` or ``grav=9.8`` must produce
a DIFFERENT trajectory, not be silently ignored (VERDICT r4 missing #1)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from mckpp_tpu import KppConfig, DomainConfig, TimeConfig, KppModel
from mckpp_tpu import constants as c
from mckpp_tpu.grid import coriolis
from mckpp_tpu.state import init_params
from mckpp_tpu.utils import namelist


NML = """
 &NAME_PARAMETERS nz=10, nx=2, ny=1 &END
 &NAME_CONSTANTS {body} &END
 &NAME_PROCSWIT &END
 &NAME_DOMAIN dmax=200.0 &END
 &NAME_LANDSEA &END
 &NAME_START &END
 &NAME_TIMES dtsec=3600.0, startt=0.0, finalt=1.0, ndtocn=3 &END
 &NAME_COUPLE &END
 &NAME_ADVEC &END
 &NAME_PARAS &END
 &NAME_FORCING &END
 &NAME_OUTPUT &END
"""


def test_defaults_match_reference():
    """Empty NAME_CONSTANTS (the reference's own production namelist,
    run/3D_ocn.nml:8) yields the reference defaults."""
    cfg, _ = namelist.config_from_namelist(NML.format(body=""))
    cst = cfg.constants
    assert cst.spd == 86400.0
    assert cst.dpy == 360.0
    assert cst.grav == 9.816
    assert cst.vonk == 0.4
    assert cst.tk0 == 273.15
    assert cst.sbc == 5.67e-8
    assert cst.epsw == 1.0
    assert cst.albocn == 0.06
    assert cst.sice == 4.0
    assert cst.el == 2.50e6
    assert cst.sl == 2512200.0
    assert cst.fl == 334000.0
    # FLSN=FL is assigned BEFORE the namelist READ in the reference, so
    # flsn's own default is the default FL, independent of fl overrides
    assert cst.flsn == 334000.0
    np.testing.assert_allclose(cst.twopi, 8.0 * np.arctan(1.0))
    np.testing.assert_allclose(cst.onepi, 4.0 * np.arctan(1.0))


def test_all_fifteen_ingest():
    body = ("spd=86400., dpy=365., twopi=6.28, onepi=3.14, grav=9.8, "
            "vonk=0.41, TK0=273.16, sbc=5.6e-8, epsw=0.99, albocn=0.07, "
            "sice=5.0, EL=2.4e6, SL=2.5e6, FL=3.3e5, FLSN=3.35e5")
    cfg, _ = namelist.config_from_namelist(NML.format(body=body))
    cst = cfg.constants
    assert (cst.dpy, cst.grav, cst.vonk, cst.tk0) == (365.0, 9.8, 0.41,
                                                      273.16)
    assert (cst.sice, cst.el, cst.flsn) == (5.0, 2.4e6, 3.35e5)


def test_unknown_variable_aborts():
    with pytest.raises(ValueError, match="NAME_CONSTANTS"):
        namelist.config_from_namelist(NML.format(body="nonsuch=1.0"))


def test_fl_override_does_not_change_flsn():
    cfg, _ = namelist.config_from_namelist(NML.format(body="FL=1.0"))
    assert cfg.constants.fl == 1.0
    assert cfg.constants.flsn == 334000.0


def test_spd_override_changes_derived_times():
    """The reference derives nend = (finalt-startt)*spd/dtsec from the
    namelist spd (mckpp_initialize_namelist_mod.F90:177)."""
    cfg, _ = namelist.config_from_namelist(NML.format(body=""))
    assert cfg.time.nend == 24
    cfg2, _ = namelist.config_from_namelist(NML.format(body="spd=43200."))
    assert cfg2.time.nend == 12


def _run(cst_kwargs, ncol=2, nz=24, steps=4, pass_impl=None):
    cfg = KppConfig(
        domain=DomainConfig(nx=ncol, ny=1, nz=nz, dmax=250.0),
        time=TimeConfig(dtsec=1200.0, ndtocn=1, startt=0.0, finalt=1.0),
        constants=c.Constants(**cst_kwargs))
    if pass_impl is not None:
        cfg = dataclasses.replace(
            cfg, physics=dataclasses.replace(cfg.physics,
                                             pass_impl=pass_impl))
    model = KppModel(cfg)
    nzp1 = model.grid.nzp1
    zm = np.asarray(model.grid.zm)
    t0 = np.tile(20.0 + 5.0 * np.exp(zm / 50.0), (ncol, 1))
    s0 = np.tile(35.0 - 0.5 * np.exp(zm / 100.0), (ncol, 1))
    u0 = np.zeros((ncol, nzp1, 2))
    prm = init_params(ncol, nzp1)
    prm = dataclasses.replace(
        prm, f=coriolis(jnp.full((ncol,), 15.0),
                        twopi=cfg.constants.twopi),
        dlat=jnp.full((ncol,), 15.0),
        ocdepth=jnp.full((ncol,), -10000.0))
    st, prm, frc = model.initial_state(u0, t0, s0, prm)
    st, frc = model.run(st, prm, frc, num_steps=steps)
    return st


@pytest.mark.parametrize("pass_impl", ["fused_xla", "fused_xla_step",
                                       "reference"])
def test_vonk_changes_trajectory(pass_impl):
    base = _run({}, pass_impl=pass_impl)
    mod = _run({"vonk": 0.41}, pass_impl=pass_impl)
    # von Karman enters the velocity scales/bldepth: the mixed layer and
    # the temperature profile must respond
    assert not np.allclose(np.asarray(base.x), np.asarray(mod.x),
                           rtol=0, atol=1e-12)


def test_grav_changes_trajectory():
    base = _run({})
    mod = _run({"grav": 9.5})
    assert not np.allclose(np.asarray(base.x), np.asarray(mod.x),
                           rtol=0, atol=1e-12)


def test_default_constants_identical_to_hardwired():
    """Constants() defaults reproduce the pre-threading trajectory
    bitwise (no accidental default drift)."""
    base = _run({})
    explicit = _run({"grav": c.GRAV, "vonk": c.VONK, "sice": c.SICE})
    np.testing.assert_array_equal(np.asarray(base.x),
                                  np.asarray(explicit.x))
    np.testing.assert_array_equal(np.asarray(base.hmix),
                                  np.asarray(explicit.hmix))
