"""Penetrating shortwave absorption: Simpson & Paulson (1977) two-band model.

Reimplements the reference's swfrac routines
(mckpp_physics_swfrac_mod.F90:14-79, mckpp_fluxes_mod.F90:121-137).
``jerlov`` is a 0-based water-type index 0..4 = I, IA, IB, II, III
(the reference uses 1-based 1..5).

Note the asymmetry preserved from the reference: the per-level cached version
(:func:`swfrac_levels`, used by bldepth) clips the exponent at rmin=-80,
while :func:`swdk` (used for the hbl evaluation and the non-turbulent flux
profile wXNT via mckpp_fluxes_swdk) — the "_opt" cached variant clips, the
plain mckpp_fluxes_swdk does not.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants as c

# numpy (not jnp): creating device arrays at import time would initialize
# the XLA backend during `import mckpp_tpu`, which breaks
# jax.distributed.initialize() in multi-host entry points (it must run
# before any backend init).  These trace into jitted code as constants
# either way.
_RFAC = np.asarray(c.JERLOV_RFAC)
_A1 = np.asarray(c.JERLOV_A1)
_A2 = np.asarray(c.JERLOV_A2)


def _coeffs(jerlov, like):
    """Jerlov band coefficients in the dtype of the depth operand.

    np.float64 tables are STRONGLY typed: under jax_enable_x64 (the test
    suite's reference-precision mode) they would silently promote an f32
    model's bfsfc/stable/case_a chain to f64 — the coefficients must
    follow the computation dtype, not the table's."""
    dt = jnp.result_type(like)
    rfac = jnp.asarray(_RFAC, dt)[jerlov]
    return rfac, jnp.asarray(_A1, dt)[jerlov], jnp.asarray(_A2, dt)[jerlov]


def swfrac_levels(fact, zm, jerlov):
    """Cached per-level sw fraction with rmin clipping
    (reference: MCKPP_PHYSICS_SWFRAC_OPT, mckpp_physics_swfrac_mod.F90:14-43).

    zm: (nzp1,) level depths (<0); jerlov: scalar int index (0-based).
    Returns (nzp1,) fractions.
    """
    rfac, a1, a2 = _coeffs(jerlov, zm)
    r1 = jnp.maximum(zm * fact / a1, c.SWFRAC_RMIN)
    r2 = jnp.maximum(zm * fact / a2, c.SWFRAC_RMIN)
    return rfac * jnp.exp(r1) + (1.0 - rfac) * jnp.exp(r2)


def swfrac(fact, z, jerlov):
    """Pointwise sw fraction with rmin clipping
    (reference: MCKPP_PHYSICS_SWFRAC, mckpp_physics_swfrac_mod.F90:49-79)."""
    rfac, a1, a2 = _coeffs(jerlov, z)
    r1 = jnp.maximum(z * fact / a1, c.SWFRAC_RMIN)
    r2 = jnp.maximum(z * fact / a2, c.SWFRAC_RMIN)
    return rfac * jnp.exp(r1) + (1.0 - rfac) * jnp.exp(r2)


def swdk(z, jerlov):
    """Unclipped sw decay used for the solar-heating profile
    (reference: mckpp_fluxes_swdk, mckpp_fluxes_mod.F90:121-137)."""
    rfac, a1, a2 = _coeffs(jerlov, z)
    return rfac * jnp.exp(z / a1) + (1.0 - rfac) * jnp.exp(z / a2)
