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


def two_prod_presplit(a, ah, al, b, bh, bl):
    """Dekker TwoProd with both operands pre-split (9 flops).

    tf96 multiplies form three products over four distinct words
    (a0*b0, a0*b1, a1*b0) — sharing the four Veltkamp splits saves
    8 flops per product vs calling two_prod three times (ops/tf96.py
    carries the full ledger).  Exactness is unchanged: the split is a
    pure function of the word."""
    p = a * b
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
#
# Sublane alignment is load-bearing: slicing an (s, L) array at a row
# offset that is not a multiple of 8 forces a Mosaic relayout (cross-
# sublane shift) PER OP, which measured ~70x slower on n_pad=40 when the
# tree halved 40 -> 20 -> 10 -> 5.  Non-power-of-two sizes therefore
# first fold aligned 8-row groups (slices at multiples of 8 only), then
# run the power-of-two ladder from 8.


def tree_prod_f32(x):
    """Product over axis 0 of an (s, L) f32 array, log-depth tree.
    s must be a power of two or a multiple of 8."""
    s = x.shape[0]
    if s & (s - 1) != 0:
        assert s % 8 == 0, f"pad axis 0 to a multiple of 8, got {s}"
        p = x[0:8] * x[8:16]
        for b in range(2, s // 8):
            p = p * x[8 * b:8 * b + 8]
        x, s = p, 8
    while s > 1:
        s //= 2
        x = x[:s] * x[s:]
    return x


def tree_prod_df64(x):
    """Exact-leaning product over axis 0 of (s, L) f32 -> df64 (hi, lo).

    Level 1 uses exact TwoProd on f32 pairs; higher levels are df64
    multiplies.  Relative error ~ depth * 2^-48.  s must be a power of
    two or a multiple of 8 (aligned 8-row groups fold first)."""
    s = x.shape[0]
    if s & (s - 1) != 0:
        assert s % 8 == 0, f"pad axis 0 to a multiple of 8, got {s}"
        hi, lo = two_prod(x[0:8], x[8:16])
        for b in range(2, s // 8):
            hi, lo = df_mul_f32(hi, lo, x[8 * b:8 * b + 8])
        s = 8
    else:
        h = s // 2
        hi, lo = two_prod(x[:h], x[h:])
        s = h
    while s > 1:
        s //= 2
        hi, lo = df_mul(hi[:s], lo[:s], hi[s:], lo[s:])
    return hi, lo


def tree_prod_full_df(xhi, xlo):
    """Product over axis 0 of an (s, L) df64 PAIR -> (1, L) df64.
    Level 1 folds the lo parts into the exact TwoProd by one df
    correction; higher levels are df64 multiplies."""
    s = xhi.shape[0]

    def pair_l1(ahi, alo, bhi, blo):
        phi, plo = two_prod(ahi, bhi)
        plo = plo + (ahi * blo + alo * bhi)
        return quick_two_sum(phi, plo)

    if s & (s - 1) != 0:
        assert s % 8 == 0, f"pad axis 0 to a multiple of 8, got {s}"
        hi, lo = pair_l1(xhi[0:8], xlo[0:8], xhi[8:16], xlo[8:16])
        for b in range(2, s // 8):
            sl = slice(8 * b, 8 * b + 8)
            hi, lo = df_mul(hi, lo, xhi[sl], xlo[sl])
        s = 8
    else:
        h = s // 2
        hi, lo = pair_l1(xhi[:h], xlo[:h], xhi[h:], xlo[h:])
        s = h
    while s > 1:
        s //= 2
        hi, lo = df_mul(hi[:s], lo[:s], hi[s:], lo[s:])
    return hi, lo
