"""The five BASELINE.json benchmark configurations must generate and
assemble end-to-end (toy scale): synthetic inputs on the reference file
formats + a reference-format namelist -> setup.build -> a few steps."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tools")
from make_benchmark_configs import generate

from mckpp_tpu.utils import namelist as nml
from mckpp_tpu import setup as setup_mod
from mckpp_tpu import forcing as forcing_mod

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("config", ["single_column", "regional_64x64",
                                    "global_1deg", "ensemble10_dd"])
def test_config_generates_and_builds(config, tmp_path):
    d = str(tmp_path)
    generate(config, d, toy=True)
    with open(f"{d}/3D_ocn.nml") as f:
        cfg, _ = nml.config_from_namelist(f.read())
    model, st, prm, frc, fp, mgr = setup_mod.build(cfg, d)
    assert st.u.shape[0] == cfg.domain.npts
    if config == "ensemble10_dd":
        assert cfg.physics.ldd
    # one step runs and stays finite on wet columns
    if fp is not None:
        raw = fp(cfg.time.startt)      # nt=1 read time (cli convention)
    else:
        raw = forcing_mod.constant_test_fluxes(st.u.shape[0], model.dtype)
    st, frc = forcing_mod.update_fluxes(cfg, st, prm, frc, raw,
                                        jnp.asarray(True), model.grid.dm)
    out = model.step(st, prm, frc, first_step=True)
    wet = np.asarray(prm.l_ocean)
    assert np.all(np.isfinite(np.asarray(out.x)[wet]))
