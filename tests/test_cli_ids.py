"""Reference algorithm-id compatibility: every documented -p id routes to
a working engine configuration (SURVEY.md §2; v1 README.md:21-38, v2
main.cpp:288-516)."""

import numpy as np
import pytest

from superman_tpu.cli import build_parser, flags_from_args
from superman_tpu.core.matrix import DenseMatrix
from superman_tpu.drivers.runner import run
from superman_tpu.io.triplet import write_triplet
from superman_tpu.ops.oracle import perman_brute
from tests.conftest import random_int_matrix


@pytest.fixture(scope="module")
def mat(tmp_path_factory):
    rng = np.random.default_rng(5)
    a = random_int_matrix(rng, 12, 0.6, vmax=2)
    np.fill_diagonal(a, 1)
    path = tmp_path_factory.mktemp("ids") / "m.txt"
    write_triplet(str(path), DenseMatrix(a, "int"))
    # Rasmussen (ids 1/3) binarizes by design -> pattern permanent
    return str(path), perman_brute(a), perman_brute((a != 0).astype(int))


EXACT_IDS = ["0", "1", "2", "3", "4", "5", "6", "7", "8", "14", "17"]
APPROX_IDS = ["1", "2", "3", "4"]


@pytest.mark.parametrize("pid", EXACT_IDS)
def test_exact_ids(mat, pid):
    path, want, _ = mat
    argv = ["-f", path, "-g", "-p", pid, "-t", "2"]
    args = build_parser().parse_args(argv)
    flags = flags_from_args(args)
    import superman_tpu as sp
    res = sp.permanent(path, **vars(flags))
    assert res.permanent == pytest.approx(want, rel=1e-6), pid


@pytest.mark.parametrize("pid", APPROX_IDS)
def test_approx_ids(mat, pid):
    path, want, want_pattern = mat
    argv = ["-f", path, "-g", "-a", "-p", pid, "-x", "20000", "-t", "2"]
    args = build_parser().parse_args(argv)
    flags = flags_from_args(args)
    import superman_tpu as sp
    res = sp.permanent(path, **vars(flags))
    target = want_pattern if pid in ("1", "3") else want
    assert res.permanent == pytest.approx(target, rel=0.35), pid
