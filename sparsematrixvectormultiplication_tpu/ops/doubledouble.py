"""Double-double (two-float) arithmetic — fp64-class math on the TPU VPU.

The reference computes everything in fp64 (C doubles). TPU v5e has no native
f64: XLA emulates it (usable for the jnp oracle kernels) but **Mosaic/Pallas
rejects 64-bit types**, so the Pallas performance kernels represent each
value as an unevaluated pair of f32s ``(hi, lo)`` with ``hi + lo`` the
fp64-class value and ``|lo| <= ulp(hi)/2``. Error-free transforms (Dekker /
Knuth, no FMA required) give ~2^-48 relative accuracy — comfortably below
the 1e-9 validation bar (BASELINE.json).

All functions are plain jnp expressions usable inside Pallas kernels and in
XLA alike.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "split_f64",
    "combine_f64",
    "two_sum",
    "fast_two_sum",
    "two_prod",
    "dd_add_dd",
    "dd_mul_dd",
]

_SPLITTER = np.float32(4097.0)  # 2^12 + 1 (Dekker split for f32: 24-bit mantissa)


def split_f64(x: np.ndarray):
    """Host-side split of fp64 into (hi, lo) f32 with hi + lo == fp64(x)
    to f32-pair precision."""
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def combine_f64(hi, lo):
    """Device/host combine back to fp64 (XLA side, outside Pallas)."""
    return jnp.asarray(hi, jnp.float64) + jnp.asarray(lo, jnp.float64)


def two_sum(a, b):
    """Knuth two-sum: s + err == a + b exactly (6 flops, branch-free)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def fast_two_sum(a, b):
    """Dekker fast-two-sum; requires |a| >= |b| (3 flops)."""
    s = a + b
    err = b - (s - a)
    return s, err


def _dekker_split(a):
    """Split f32 into high/low 12-bit halves such that a == ah + al exactly."""
    c = _SPLITTER * a
    ah = c - (c - a)
    al = a - ah
    return ah, al


def two_prod(a, b):
    """Dekker two-product: p + err == a * b exactly (no FMA needed)."""
    p = a * b
    ah, al = _dekker_split(a)
    bh, bl = _dekker_split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def dd_add_dd(xh, xl, yh, yl):
    """(xh,xl) + (yh,yl) -> normalized dd."""
    sh, se = two_sum(xh, yh)
    te = se + (xl + yl)
    return fast_two_sum(sh, te)


def dd_mul_dd(xh, xl, yh, yl):
    """(xh,xl) * (yh,yl) -> dd (drops the xl*yl term, ~2^-48 accurate)."""
    ph, pe = two_prod(xh, yh)
    pl = pe + (xh * yl + xl * yh)
    return fast_two_sum(ph, pl)
