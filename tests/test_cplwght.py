"""Coupling-weight initialization tests.

Reference: mckpp_initialize_coupling_weight_mod.F90:22-55 (read ``alpha``
over the KPP domain when l_couple/l_cplwght, zeros otherwise) and the
run_physics gating ``l_ocean .AND. cplwght > 0`` when coupled
(mckpp_initialize_fields_mod.F90:146-153).
"""

import dataclasses

import numpy as np
import pytest

from mckpp_tpu.io import ncio
from mckpp_tpu.utils import namelist as nml

import test_endtoend as e2e


def write_cplwght(d, nx, ny, lons, lats):
    alpha = np.linspace(0.0, 1.0, ny * nx).reshape(ny, nx)
    alpha[0, 1] = 0.0                       # a sea point with zero weight
    ncio.write_fields(
        str(d / "cplwght.nc"),
        {"longitude": nx, "latitude": ny},
        {"longitude": ("longitude", lons), "latitude": ("latitude", lats)},
        {"alpha": (("latitude", "longitude"), alpha)})
    return alpha


def _build(tmp_path, couple_line):
    e2e.write_inputs(tmp_path)
    lons = 90.0 + 0.5 * np.arange(e2e.NX)
    lats = -5.0 + 0.5 * np.arange(e2e.NY)
    alpha = write_cplwght(tmp_path, e2e.NX, e2e.NY, lons, lats)
    text = (tmp_path / "3D_ocn.nml").read_text()
    text = text.replace(" &NAME_COUPLE L_COUPLE=.F., &END",
                        f" &NAME_COUPLE {couple_line} &END")
    (tmp_path / "3D_ocn.nml").write_text(text)
    cfg, _ = nml.config_from_namelist(text)
    from mckpp_tpu import setup as setup_mod
    model, st, prm, frc, fp, mgr = setup_mod.build(cfg, str(tmp_path))
    return cfg, prm, alpha


def test_cplwght_read_uncoupled(tmp_path):
    cfg, prm, alpha = _build(
        tmp_path, "L_COUPLE=.F., L_CPLWGHT=.T., cplwght_file='cplwght.nc',")
    assert cfg.boundary.l_cplwght and not cfg.boundary.l_couple
    np.testing.assert_allclose(np.asarray(prm.cplwght),
                               alpha.reshape(-1), rtol=1e-12)
    # uncoupled: run_physics is just l_ocean (one land point at (0,0))
    rp = np.asarray(prm.run_physics).reshape(e2e.NY, e2e.NX)
    assert not rp[0, 0] and rp[0, 1]


def test_cplwght_gates_run_physics_when_coupled(tmp_path):
    cfg, prm, alpha = _build(
        tmp_path, "L_COUPLE=.T., cplwght_file='cplwght.nc',")
    rp = np.asarray(prm.run_physics).reshape(e2e.NY, e2e.NX)
    lo = np.asarray(prm.l_ocean).reshape(e2e.NY, e2e.NX)
    np.testing.assert_array_equal(rp, lo & (alpha > 0.0))
    assert not rp[0, 1], "zero-weight sea point must not run physics"
    assert rp[1, 1]


def test_cplwght_zero_when_unset(tmp_path):
    cfg, prm, _ = _build(tmp_path, "L_COUPLE=.F.,")
    assert np.all(np.asarray(prm.cplwght) == 0.0)
