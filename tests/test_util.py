"""Shared helpers (patapsco_ray/util.py)."""

from patapsco_ray.util import fixed_pool, tune_malloc


def test_fixed_pool_pins_scalar():
    assert fixed_pool(4) == (4, 4)
    assert fixed_pool((2, 8)) == (2, 8)
    assert fixed_pool(None) is None


def test_tune_malloc_glibc():
    # this sandbox is glibc; mallopt must succeed and be idempotent
    assert tune_malloc() is True
    assert tune_malloc() is True
