"""Tridiagonal system assembly and solution for the implicit vertical
diffusion solve.

Reimplements mckpp_physics_solvers.F90: tridcof (:14-44), tridrhs (:53-107),
tridmat (Thomas algorithm, :112-161) and rhsmod (advection corrections,
:176-335) as per-column ops.  The Thomas solve is a lax.scan over z —
sequential in the (short) vertical, batched over columns by vmap, which is
the TPU-friendly layout (columns fill the vector lanes).

Conventions: ``diff`` is a Fortran-aligned interface array (nz+2,);
``ghat`` (nz+1,); ``yo`` is a 0-based level array (nzp1,);
``tri_dn``/``tri_up`` as built in grid.py.  Solutions are (nzp1,) with
``yn[nz] = yo[nz]`` (the fictitious bottom layer is held fixed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tridcof(diff, tri_dn, tri_up, nz):
    """Matrix coefficients: cu (upper), cc (diagonal), cl (lower), each
    (nz,) 0-based rows (row i == Fortran row i+1)."""
    dtype = diff.dtype
    i = jnp.arange(1, nz + 1)           # Fortran row index
    cu = jnp.where(i == 1, 0.0, -tri_up[i] * diff[i - 1])
    cc = jnp.where(i == 1,
                   1.0 + tri_dn[1] * diff[1],
                   1.0 + tri_dn[i] * diff[i] + tri_up[i] * diff[i - 1])
    cl = jnp.where(i == nz, 0.0, -tri_dn[i] * diff[i])
    return cu.astype(dtype), cc.astype(dtype), cl.astype(dtype)


def tridrhs(hm, yo, ntflux, diff, ghat, sturflux, ghatflux, dto,
            tri_dn, nz):
    """Scalar-equation right-hand side (npd=1 path of the reference).

    hm: (nzp1,) thicknesses; yo: (nzp1,) old profile; ntflux: (nz+1,)
    non-turbulent flux on interfaces; ghat: (nz+1,).  Returns (nz,).
    """
    i = jnp.arange(1, nz + 1)           # Fortran rows
    ghterm = ghatflux * (diff[i] * ghat[i] - diff[i - 1] * ghat[i - 1])
    ntterm = ntflux[i] - ntflux[i - 1]
    rhs = yo[i - 1] + dto / hm[i - 1] * (ghterm + ntterm)
    # surface row: ghat has no (i-1) term; subtract the surface flux
    rhs_sfc = yo[0] + dto / hm[0] * (ghatflux * diff[1] * ghat[1] - sturflux
                                     + ntflux[1] - ntflux[0])
    rhs = jnp.where(i == 1, rhs_sfc, rhs)
    # bottom row: diffusive inflow from the fixed fictitious layer
    rhs = jnp.where(i == nz, rhs + yo[nz] * tri_dn[nz] * diff[nz], rhs)
    return rhs


def tridmat(cu, cc, cl, rhs, yo):
    """Thomas solve; yn[nz] = yo[nz] (reference tridmat :134-159)."""
    nz = rhs.shape[0]

    def fwd(carry, inp):
        bet_prev, yn_prev = carry
        cu_i, cc_i, cl_im1, rhs_i, first = inp
        gam_i = jnp.where(first, 0.0, cl_im1 / bet_prev)
        bet = jnp.where(first, cc_i, cc_i - cu_i * gam_i)
        yn_i = jnp.where(first, rhs_i / bet, (rhs_i - cu_i * yn_prev) / bet)
        return (bet, yn_i), (yn_i, gam_i)

    first = jnp.arange(nz) == 0
    cl_shift = jnp.concatenate([jnp.zeros(1, cl.dtype), cl[:-1]])
    (_, _), (yn_f, gam) = jax.lax.scan(
        fwd, (jnp.ones((), cc.dtype), jnp.zeros((), cc.dtype)),
        (cu, cc, cl_shift, rhs, first))

    def bwd(yn_next, inp):
        yn_i, gam_ip1 = inp
        yn_new = yn_i - gam_ip1 * yn_next
        return yn_new, yn_new

    gam_next = jnp.concatenate([gam[1:], jnp.zeros(1, gam.dtype)])
    _, yn_rev = jax.lax.scan(bwd, yn_f[-1], (yn_f[:-1][::-1], gam_next[:-1][::-1]))
    yn = jnp.concatenate([yn_rev[::-1], yn_f[-1:]])
    return jnp.concatenate([yn, yo[-1:]])


def tridmat_pcr(cu, cc, cl, rhs, yo):
    """Parallel-cyclic-reduction solve of the same system as :func:`tridmat`.

    Exact same system (cu_i y_{i-1} + cc_i y_i + cl_i y_{i+1} = rhs_i,
    reference mckpp_physics_solvers.F90:112-161) solved in ceil(log2 nz)
    elementwise elimination sweeps instead of the O(nz) sequential Thomas
    recurrence — no per-level kernel dispatch, which is the TPU-idiomatic
    layout (SURVEY.md §2.6: vertical-axis parallelism inside the solve).
    The matrix is strictly diagonally dominant (cc = 1 + |cu| + |cl| by
    construction in tridcof), for which cyclic reduction is stable.

    Results differ from Thomas only in floating-point association order.
    """
    nz = rhs.shape[0]
    a, b, c_, r = cu, cc, cl, rhs

    s = 1
    while s < nz:
        # neighbors at distance s, zero-padded outside the system
        def up(v):     # v_{i-s}
            return jnp.concatenate([jnp.zeros((s,), v.dtype), v[:-s]])

        def dn(v):     # v_{i+s}
            return jnp.concatenate([v[s:], jnp.zeros((s,), v.dtype)])

        # one reciprocal of b per level, shifted both ways (mirrors
        # fused_pass._pcr_solve so the two PCR implementations remain
        # bitwise-comparable); divides cost ~9 VPU mul slots
        rb = 1.0 / jnp.where(b == 0.0, 1.0, b)
        alpha = -a * jnp.where(up(b) == 0.0, 1.0, up(rb))
        beta = -c_ * jnp.where(dn(b) == 0.0, 1.0, dn(rb))
        b = b + alpha * up(c_) + beta * dn(a)
        r = r + alpha * up(r) + beta * dn(r)
        a = alpha * up(a)
        c_ = beta * dn(c_)
        s *= 2

    yn = r / b
    return jnp.concatenate([yn, yo[-1:]])


def rhsmod(jsclr, mode, a_mag, dto, km, dm_km, rhs, rho, cp, hm, zm, nz):
    """Advection correction of the scalar RHS (modes 1-7)
    (reference: mckpp_physics_solvers.F90:176-335, steady branch).

    jsclr: 1 (heat, W/m^2) or 2 (salt, PSU m/s * 0.033 factor);
    mode/a_mag may be traced; km is the (traced) mixed-layer level index.
    Returns the modified rhs.  mode <= 0 is a no-op.
    """
    dtype = rhs.dtype
    lvl = jnp.arange(1, nz + 1)         # Fortran level index of each row
    if jsclr == 1:
        fact_lvl = dto * a_mag / (rho[:nz] * cp[:nz])
    else:
        fact_lvl = jnp.full((nz,), dto * a_mag * 0.033, dtype=dtype)

    # mode 1: upper layer only
    add1 = jnp.where(lvl == 1, fact_lvl / hm[0], 0.0)
    # mode 2: mixed layer (levels 1..km-1), divided by its thickness
    m2 = lvl <= km - 1
    delta2 = jnp.where(m2, hm[:nz], 0.0).sum()
    add2 = jnp.where(m2, fact_lvl / jnp.where(delta2 > 0, delta2, 1.0), 0.0)
    # mode 3: whole column
    delta3 = hm[:nz].sum()
    add3 = fact_lvl / delta3
    # mode 4: below 100 m to nz-1
    n1_4 = jnp.argmax(zm[:nz] < -100.0) + 1          # first Fortran lvl with zm < -100
    any4 = (zm[:nz] < -100.0).any()
    m4 = (lvl >= n1_4) & (lvl <= nz - 1) & any4
    delta4 = jnp.where(m4, hm[:nz], 0.0).sum()
    add4 = jnp.where(m4, fact_lvl / jnp.where(delta4 > 0, delta4, 1.0), 0.0)
    # mode 5: bottom layer diffusion
    add5 = jnp.where(lvl == nz, fact_lvl / hm[nz - 1], 0.0)

    # modes 6/7: seasonal mixed-layer / thermocline bands found by a
    # cumulative-depth walk (reference :292-331)
    def band(n1, depth0, dmax_target):
        # walk n = n1..nz accumulating delta += hm(n), depth += hm(n+1),
        # stopping at the first n with depth >= dmax_target
        hm_n = hm[:nz]
        hm_np1 = hm[1:nz + 1]
        in_walk = lvl >= n1
        depth = depth0 + jnp.where(in_walk, hm_np1, 0.0).cumsum()
        # n2 = first walked level where depth >= target (or nz)
        hit = in_walk & (depth >= dmax_target)
        n2 = jnp.where(hit.any(), jnp.argmax(hit) + 1, nz)
        m = in_walk & (lvl <= n2)
        delta = jnp.where(m, hm_n, 0.0).sum()
        return jnp.where(m, fact_lvl / jnp.where(delta > 0, delta, 1.0), 0.0)

    dmax6 = dm_km - 0.5 * (hm[km - 1] + hm[km - 2])
    add6 = band(jnp.asarray(1, jnp.int32), hm[0], dmax6)
    add7 = band(km - 1, dm_km - 0.5 * hm[km - 1], jnp.asarray(100.0, dtype))

    adds = jnp.stack([jnp.zeros_like(add1), add1, add2, add3, add4, add5,
                      add6, add7])
    idx = jnp.clip(mode, 0, 7)
    return rhs + adds[idx]
