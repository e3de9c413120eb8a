"""Ancillary update-time arithmetic pinned against the reference
(mckpp_time_control.F90:71-167) — wrap edges, boundary records, negative
time, and both quantization methods (VERDICT r2 weak item 6)."""

import numpy as np
import pytest

from mckpp_tpu.io.ancillaries import get_update_time, _nint
from mckpp_tpu.io import ncio

SPD = 86400.0
DTO = 1200.0
DTSEC = 3600.0


def climatology(n, ndt_upd, offset=0.5):
    """File time axis at (k + offset) * update-period, k = 0..n-1 — the
    standard centered climatology layout."""
    upd = ndt_upd * DTO / SPD
    return (np.arange(n) + offset) * upd, upd


def test_nint_half_away_from_zero():
    # Fortran NINT semantics, not Python banker's rounding
    assert _nint(0.5) == 1 and _nint(1.5) == 2 and _nint(2.5) == 3
    assert _nint(-0.5) == -1 and _nint(-1.5) == -2
    assert _nint(0.49) == 0 and _nint(-0.49) == 0


def test_method1_centers_on_records():
    times, upd = climatology(10, 3)
    for k in range(10):
        ut, pos = get_update_time(k * upd, 3, times, False, 0, DTO, DTSEC, 1)
        assert pos == k
        np.testing.assert_allclose(ut, times[k], rtol=0, atol=1e-12)


def test_record_exactly_at_period_boundary():
    """update_time landing EXACTLY on the last record must not wrap
    (the reference wraps only for strictly-greater, :96-103)."""
    times, upd = climatology(8, 3)
    t_last = times[-1] - 0.5 * upd          # model time whose read = last
    ut, pos = get_update_time(t_last, 3, times, True, 8, DTO, DTSEC, 1)
    assert pos == 7
    np.testing.assert_allclose(ut, times[-1], atol=1e-12)


def test_periodic_wrap_matches_unwrapped_position():
    """Beyond the file, the period is subtracted until inside; the
    record index must follow the wrapped time."""
    times, upd = climatology(8, 3)
    period = 8 * upd                         # period in days (integer here
    # only when upd divides; pass the exact wrap the caller would)
    for k in range(8, 24):                   # two full extra cycles
        ut, pos = get_update_time(k * upd, 3, times, True, period,
                                  DTO, DTSEC, 1)
        assert pos == k % 8, (k, pos)
        np.testing.assert_allclose(ut, times[k % 8], atol=1e-9)


def test_nonperiodic_overflow_aborts():
    times, upd = climatology(4, 3)
    with pytest.raises(ncio.NetCDFError, match="periodic reads"):
        get_update_time(10 * upd, 3, times, False, 0, DTO, DTSEC, 1)


def test_negative_time_aborts_like_reference():
    """t < 0 with no record at the (negative) read time: the reference's
    position arithmetic runs off the FRONT of the axis and aborts — there
    is no low-side wrap (:96-103 wraps high side only)."""
    times, upd = climatology(8, 3)
    with pytest.raises(ncio.NetCDFError, match="cannot find"):
        get_update_time(-2.0 * upd, 3, times, True, 8 * upd, DTO, DTSEC, 1)


def test_negative_time_on_record_is_found():
    """A slightly negative model time whose read-time still lands on
    record 0 resolves to record 0 (NINT(-small) = 0)."""
    times, upd = climatology(8, 3)
    ut, pos = get_update_time(-1e-9, 3, times, True, 8 * upd,
                              DTO, DTSEC, 1)
    assert pos == 0


def test_method2_floor_quantization():
    """Method 2 quantizes FLOOR(time) with integer arithmetic
    (:142-154): within one whole day the read-time does not advance."""
    ndt = 72                                 # daily updates at dto=1200
    times, upd = climatology(30, ndt)
    assert upd == 1.0
    for t in (3.0, 3.25, 3.5, 3.999):
        ut, pos = get_update_time(t, ndt, times, False, 0, DTO, DTSEC, 2)
        assert pos == 3, t
        np.testing.assert_allclose(ut, 3.5, atol=1e-12)


def test_offset_axis_falls_back_to_nearest():
    """A file whose first record is NOT at offset 0.5*upd (so the
    reference position formula misses) still resolves via nearest-match,
    with the 0.01*dtsec validity gate enforced."""
    upd = 3 * DTO / SPD
    times = np.arange(6) * upd               # records at k*upd (offset 0)
    ut, pos = get_update_time(0.5 * upd, 3, times, False, 0, DTO, DTSEC, 1)
    # read time = upd; that IS a record here
    assert pos == 1
    with pytest.raises(ncio.NetCDFError, match="cannot find"):
        get_update_time(0.2 * upd, 3, times, False, 0, DTO, DTSEC, 1)
