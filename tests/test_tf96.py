"""tf96 (triple-float) calc tier: ~72-bit products/accumulation.

Ground truth is exact (python-int perman_brute / known factorials), so
these measure TRUE accuracy, not agreement with another float engine."""

import math

import numpy as np
import pytest

import superman_tpu as sp
from superman_tpu.ops.oracle import perman_brute
from tests.conftest import random_int_matrix


def test_tf96_exact_integers(rng):
    """Sparse random int matrix (brute-force DFS feasible): tf96 should
    recover the exact integer permanent (df64 is ~1e-10 there; tf96
    target ~1e-15)."""
    a = random_int_matrix(rng, 20, 0.18, vmax=3)
    np.fill_diagonal(a, rng.integers(1, 4, 20))
    want = perman_brute(a)                      # exact python int
    got = sp.permanent(a, calc="tf96", chunk_log2=6, lanes=256,
                       skip_pruning=False)
    assert got.algo_name.endswith("tf96")
    assert got.permanent == pytest.approx(float(want), rel=1e-14)


def test_tf96_all_ones_cancellation():
    """per(J_20) = 20!: the df64 worst case (~1e-7 there); tf96 should
    land within double rounding of the exact value."""
    got = sp.permanent(np.ones((20, 20), dtype=np.int64), calc="tf96")
    assert got.permanent == pytest.approx(float(math.factorial(20)),
                                          rel=1e-13)


def test_tf96_pm1_cancellation(rng):
    a = rng.choice([-1, 1], (20, 20)).astype(np.int64)
    want = perman_brute(a) if 20 <= 14 else None
    # brute is too slow dense; compare tf96 against itself via glynn-free
    # exactness: the permanent of a +-1 matrix is an even integer
    got = sp.permanent(a, calc="tf96", chunk_log2=6, lanes=256).permanent
    assert abs(got - round(got)) < 1e-4
    assert round(got) % 2 == 0


def test_tf96_falls_back_for_floats(rng):
    a = rng.random((20, 20))
    with pytest.warns(UserWarning, match="tf96 requires"):
        r = sp.permanent(a, calc="tf96", chunk_log2=6, lanes=256)
    assert "df64" in r.algo_name


def test_tf96_glynn_cross_agreement(rng):
    """tf96 Ryser vs tf96 Glynn: two independent exact formulas at
    ~2^-70 per-term precision should agree to ~1e-13."""
    a = random_int_matrix(rng, 20, 0.3, vmax=2)
    np.fill_diagonal(a, 1)
    ry = sp.permanent(a, calc="tf96", chunk_log2=6, lanes=128,
                      skip_pruning=False)
    gl = sp.permanent(a, calc="tf96", chunk_log2=6, lanes=128,
                      perman_algo="glynn")
    assert gl.permanent == pytest.approx(ry.permanent, rel=1e-13)


def test_tf96_small_n_precision(rng):
    """Small n (< 19, below the Pallas tier): tf96 must NOT degrade to the
    f32 XLA fallback (round-1 advisor finding) — it routes to the host
    long-double walk and keeps (exceeds) the ~1e-12 tier contract."""
    a = random_int_matrix(rng, 12, 0.6, vmax=9)
    np.fill_diagonal(a, rng.integers(1, 10, 12))
    want = perman_brute(a)
    got = sp.permanent(a, calc="tf96")
    assert got.permanent == pytest.approx(float(want), rel=1e-14)
    assert got.algo_name == "ryser_tf96_host"


def test_tf96_tree_exact_product_fuzz(rng):
    """Direct contract of tree_prod_tf96 (round-4 flop-cut regression):
    worst relative error vs exact Fraction products of full-mantissa
    exact-f32 inputs must stay in the ~2^-70 class (measured 2^-69.3,
    identical to the pre-cut tree on the same seed)."""
    from fractions import Fraction

    import jax.numpy as jnp

    from superman_tpu.ops.tf96 import tree_prod_tf96

    worst = 0.0
    for _ in range(20):
        s = int(rng.choice([8, 16, 32, 40]))
        m = rng.integers(2**23, 2**24, size=(s, 4)).astype(np.float64)
        sign = rng.choice([-1.0, 1.0], size=(s, 4))
        x = (m * sign * 2.0**-23).astype(np.float32)
        t0, t1, t2 = tree_prod_tf96(jnp.asarray(x))
        a = [np.asarray(v, np.float64).ravel() for v in (t0, t1, t2)]
        for lane in range(4):
            exact = Fraction(1)
            for i in range(s):
                exact *= Fraction(float(x[i, lane]))
            got = sum(Fraction(float(w[lane])) for w in a)
            worst = max(worst, abs(float((got - exact) / exact)))
    assert worst < 2.0**-66, worst
