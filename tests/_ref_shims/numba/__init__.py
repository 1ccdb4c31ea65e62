"""Minimal numba stand-in so the reference's pure-Python numba kernels
(/root/reference/empanada/array_utils.py etc.) run un-jitted on tiny test
fixtures.  ``@numba.jit(nopython=True)`` becomes an identity decorator."""

import numpy as np

from . import types, typed  # noqa: F401

int64 = np.int64


def jit(*args, **kwargs):
    if args and callable(args[0]):
        return args[0]

    def deco(fn):
        return fn

    return deco


njit = jit
