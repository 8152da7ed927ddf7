"""Double-float (df64) arithmetic: ~49-bit-mantissa reals as (hi, lo) f32 pairs.

TPU VPUs are f32-native; the reference's `double` calc type
(revised_perman/flags.h default; algo.h accumulates products in double over a
float x-vector) is reproduced on TPU with compensated f32-pair arithmetic.
All building blocks are branch-free and XLA-safe (no fast-math reassociation
is applied by XLA, so Dekker/Knuth error terms survive compilation).

These run inside Pallas kernels and in plain jnp code alike.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SPLIT = 4097.0  # 2**12 + 1, Veltkamp split constant for f32


def two_sum(a, b):
    """Knuth TwoSum: a + b = s + e exactly (6 flops)."""
    s = a + b
    z = s - a
    e = (a - (s - z)) + (b - z)
    return s, e


def quick_two_sum(a, b):
    """Dekker FastTwoSum, requires |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def veltkamp_split(v):
    """Split f32 into high/low 12-bit halves: v = h + l exactly."""
    c = v * _SPLIT
    h = c - (c - v)
    return h, v - h


def two_prod(a, b):
    """Dekker TwoProd: a * b = p + e exactly (17 flops, fma-free)."""
    p = a * b
    ah, al = veltkamp_split(a)
    bh, bl = veltkamp_split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_add(ahi, alo, bhi, blo):
    """df64 + df64 (Bailey's sloppy add; ~11 flops, error O(eps^2))."""
    s, e = two_sum(ahi, bhi)
    e = e + (alo + blo)
    return quick_two_sum(s, e)


def df_add_f32(ahi, alo, b):
    s, e = two_sum(ahi, b)
    e = e + alo
    return quick_two_sum(s, e)


def df_mul(ahi, alo, bhi, blo):
    """df64 * df64 (~23 flops)."""
    p, e = two_prod(ahi, bhi)
    e = e + (ahi * blo + alo * bhi)
    return quick_two_sum(p, e)


def df_mul_f32(ahi, alo, b):
    """df64 * f32 (~21 flops)."""
    p, e = two_prod(ahi, b)
    e = e + alo * b
    return quick_two_sum(p, e)


def df_neg(hi, lo):
    return -hi, -lo


# ---------------------------------------------------------------- host side

def split_f64(x: np.ndarray):
    """Split float64 array into an exact (hi, lo) f32 pair (host)."""
    hi = np.asarray(x, dtype=np.float64).astype(np.float32)
    lo = (np.asarray(x, dtype=np.float64) - hi.astype(np.float64)).astype(
        np.float32)
    return hi, lo


def join_f64(hi, lo) -> np.ndarray:
    """Recombine (hi, lo) f32 arrays into float64 on host."""
    return np.asarray(hi, dtype=np.float64) + np.asarray(lo, dtype=np.float64)


# ------------------------------------------------------------ tree products

def tree_prod_f32(x):
    """Product over axis 0 of an (s, L) f32 array, log-depth tree.

    Axis-0 length must be a power of two or 5*2^k (the padded n layouts this
    engine uses); general sizes fall back to jnp.prod.
    """
    s = x.shape[0]
    while s > 1 and s % 2 == 0:
        s //= 2
        x = x[:s] * x[s:]
    if s == 5:
        return x[0:1] * x[1:2] * x[2:3] * x[3:4] * x[4:5]
    if s == 1:
        return x
    return jnp.prod(x, axis=0, keepdims=True)


def tree_prod_df64(x):
    """Exact-leaning product over axis 0 of (s, L) f32 -> df64 (hi, lo).

    Level 1 uses exact TwoProd on f32 pairs; higher levels are df64
    multiplies.  Relative error ~ depth * 2^-48.
    """
    s = x.shape[0]
    assert s % 2 == 0, "pad axis 0 to an even size"
    h = s // 2
    hi, lo = two_prod(x[:h], x[h:])
    s = h
    while s > 1 and s % 2 == 0:
        s //= 2
        hi, lo = df_mul(hi[:s], lo[:s], hi[s:], lo[s:])
    if s == 5:
        return _prod5(hi, lo)
    assert s == 1, f"unsupported tree size {s}"
    return hi, lo


def _prod5(hi, lo):
    """Product of the 5 rows of an (5, L) df64 pair -> (1, L)."""
    phi, plo = df_mul(hi[0:1], lo[0:1], hi[1:2], lo[1:2])
    phi, plo = df_mul(phi, plo, hi[2:3], lo[2:3])
    phi, plo = df_mul(phi, plo, hi[3:4], lo[3:4])
    phi, plo = df_mul(phi, plo, hi[4:5], lo[4:5])
    return phi, plo
