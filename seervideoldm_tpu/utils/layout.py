"""Layout helpers between the reference's (b, c, f, h, w) and our
TPU-native channels-last (b, f, h, w, c)."""
from __future__ import annotations


def bcfhw_to_bfhwc(x):
    """(b, c, f, h, w) -> (b, f, h, w, c). Works on numpy or jnp arrays."""
    return x.transpose(0, 2, 3, 4, 1)


def bfhwc_to_bcfhw(x):
    """(b, f, h, w, c) -> (b, c, f, h, w)."""
    return x.transpose(0, 4, 1, 2, 3)
