"""Glynn-formula engine: independent cross-algorithm agreement with the
Ryser/Nijenhuis-Wilf paths (the reference's primary oracle mechanism)."""

import numpy as np
import pytest

import superman_tpu as sp
from superman_tpu.ops.oracle import perman64, perman_brute, perman_glynn
from tests.conftest import random_int_matrix, random_float_matrix


@pytest.mark.parametrize("n", [4, 8, 12])
def test_glynn_host_matches_brute(rng, n):
    a = random_int_matrix(rng, n, 0.6, vmax=3)
    assert perman_glynn(a) == pytest.approx(perman_brute(a), rel=1e-10)


def test_glynn_host_float(rng):
    a = random_float_matrix(rng, 14, 0.5)
    assert perman_glynn(a) == pytest.approx(perman64(a), rel=1e-10)


def test_glynn_kernel_matches_ryser(rng):
    a = random_int_matrix(rng, 21, 0.5, vmax=2)
    ry = sp.permanent(a, calc="df64", chunk_log2=6, lanes=256)
    gl = sp.permanent(a, calc="df64", chunk_log2=6, lanes=256,
                      perman_algo="glynn")
    assert gl.algo_name.startswith("glynn_pallas")
    assert gl.permanent == pytest.approx(ry.permanent, rel=1e-8)


def test_glynn_small_n_host_path(rng):
    a = random_int_matrix(rng, 10, 0.6, vmax=2)
    gl = sp.permanent(a, perman_algo="glynn")
    assert gl.permanent == pytest.approx(perman_brute(a), rel=1e-10)
