"""Rectangular permanents (flags.rectangular): per_rect(A) = sum over
injections of the smaller side into the larger, computed through the
exact padding identity per_rect(A) = per([A; ones(n-m, n)]) / (n-m)!
(api._pad_rect).  The reference rejects non-square input outright
(read_matrix.hpp:11-157) even though its own corpus ships one
(unknown_perman/ch5-5-b2.mtx, 600x200)."""

import itertools

import numpy as np
import pytest

import superman_tpu as sp


def per_rect_brute(a):
    m, n = a.shape
    if m > n:
        a = a.T
        m, n = n, m
    tot = 0.0
    for cols in itertools.permutations(range(n), m):
        p = 1.0
        for i, j in enumerate(cols):
            p *= a[i, j]
        tot += p
    return tot


def test_rect_exact_matches_injection_sum(rng):
    a = rng.integers(0, 4, (3, 5)).astype(np.float64)
    want = per_rect_brute(a)
    r = sp.permanent(a, rectangular=True)
    assert r.permanent == pytest.approx(want, rel=1e-12)
    assert r.meta["rect_shape"] == [3, 5]
    assert r.meta["pad_rows"] == 2


def test_rect_transpose_convention(rng):
    """m > n inputs are transposed: per_rect(A) == per_rect(A^T)."""
    a = rng.integers(0, 3, (4, 6)).astype(np.float64)
    r1 = sp.permanent(a, rectangular=True)
    r2 = sp.permanent(a.T, rectangular=True)
    assert r1.permanent == r2.permanent


def test_rect_int_storage_exact(rng):
    """Integer input keeps int storage through the ones-padding, so the
    exact-f32 tiers stay reachable; a square input is untouched."""
    a = rng.integers(0, 3, (3, 5))
    want = per_rect_brute(a.astype(np.float64))
    r = sp.permanent(a, rectangular=True)
    assert r.permanent == pytest.approx(want, rel=1e-12)
    sq = rng.integers(0, 3, (5, 5))
    rs = sp.permanent(sq, rectangular=True)      # no-op on square
    assert "rect_shape" not in rs.meta


def test_rect_rejected_without_flag(rng):
    with pytest.raises(ValueError, match="square"):
        sp.permanent(rng.integers(0, 3, (3, 5)))


def test_rect_estimator_converges(rng):
    a = rng.uniform(0.2, 2.0, (4, 7))
    want = per_rect_brute(a)
    r = sp.permanent(a, approximation=True, perman_algo="scaling",
                     number_of_times=40000, seed=4, rectangular=True)
    assert r.permanent == pytest.approx(want, rel=0.2)


def test_rect_gurvits_signed(rng):
    """The padding identity is purely algebraic, so the signed Gurvits
    estimator works on rectangular input too — within a few stderr."""
    a = rng.integers(-2, 3, (4, 6)).astype(np.float64)
    want = per_rect_brute(a)
    r = sp.permanent(a, approximation=True, perman_algo="gurvits",
                     number_of_times=300000, seed=5, rectangular=True)
    assert r.meta["stderr"] > 0
    assert abs(r.permanent - want) < 6 * r.meta["stderr"]


def test_rect_mtx_reader(tmp_path):
    """MatrixMarket reader accepts m != n only under allow_rect, and the
    full driver path computes the injection-sum permanent of the file."""
    p = tmp_path / "r.mtx"
    p.write_text("%%MatrixMarket matrix coordinate integer general\n"
                 "2 4 5\n1 1 2\n1 3 1\n2 2 1\n2 4 3\n1 4 1\n")
    a = np.array([[2, 0, 1, 1], [0, 1, 0, 3]], np.float64)
    want = per_rect_brute(a)
    from superman_tpu.io.matrixmarket import read_any
    with pytest.raises(ValueError, match="square"):
        read_any(str(p), 0, 0, 0)
    dm = read_any(str(p), 0, 0, 0, allow_rect=True)
    assert dm.mat.shape == (2, 4)
    r = sp.permanent(str(p), rectangular=True)
    assert r.permanent == pytest.approx(want, rel=1e-12)
