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


# v2-only dense ids (21 = xglobal, 66 = v1 manual distribution)
EXTRA_DENSE_IDS = ["21", "66"]
# sparse-context ids (v1 main.cu:106-155 / v2 main.cpp:399-524)
SPARSE_IDS = ["1", "2", "3", "4", "5", "6", "7", "8", "14", "17", "66"]


@pytest.mark.parametrize("pid", EXTRA_DENSE_IDS)
def test_extra_dense_ids(mat, pid):
    path, want, _ = mat
    args = build_parser().parse_args(["-f", path, "-g", "-p", pid])
    import superman_tpu as sp
    res = sp.permanent(path, **vars(flags_from_args(args)))
    assert res.permanent == pytest.approx(want, rel=1e-6), pid


@pytest.mark.parametrize("pid", SPARSE_IDS)
def test_sparse_context_ids(mat, pid):
    path, want, _ = mat
    args = build_parser().parse_args(
        ["-f", path, "-g", "-s", "-r", "2", "-p", pid, "-t", "2"])
    flags = flags_from_args(args)
    assert flags.sparse
    import superman_tpu as sp
    res = sp.permanent(path, **vars(flags))
    assert res.permanent == pytest.approx(want, rel=1e-6), pid


def test_id_behavior_table():
    """The ONE id table drives both the CLI and mesh_for_flags; spot-check
    the context-dependent entries (VERDICT round-1 item 7)."""
    from superman_tpu.core.flags import id_behavior
    # dense 7 = v2 multigpucpu_chunks -> multi+hybrid
    b = id_behavior("7", sparse=False, approximation=False)
    assert b["multi"] and b["hybrid"] and not b["sparse"]
    # sparse 7 = v1 SkipPer -> single-device pruned path
    b = id_behavior("7", sparse=True, approximation=False)
    assert not b["multi"] and not b["hybrid"] and b["sparse"]
    # 8/17 without -s imply the sparse path
    for pid in ("8", "17"):
        b = id_behavior(pid, sparse=False, approximation=False)
        assert b["sparse"] and b["multi"] and b["hybrid"]
    # approx 3/4 = hybrid chunk estimators
    b = id_behavior("3", sparse=False, approximation=True)
    assert b["algo"] == "rasmussen" and b["multi"] and b["hybrid"]
    # CLI sets and mesh_for_flags now agree by construction: ids 7/8 get a
    # mesh through BOTH paths in their multi contexts
    from superman_tpu.core.flags import Flags
    from superman_tpu.parallel.mesh import mesh_for_flags
    m = mesh_for_flags(Flags(perman_algo="7", sparse=False))
    assert m is not None and int(np.prod(m.devices.shape)) > 1
    m = mesh_for_flags(Flags(perman_algo="8", sparse=True))
    assert m is not None


def test_unknown_ids_rejected(mat):
    """Unmapped ids error out loudly (reference: 'No algorithm with
    specified setting, exiting..') instead of silently misrouting."""
    path, _, _ = mat
    import superman_tpu as sp
    with pytest.raises(ValueError, match="unknown"):
        sp.permanent(path, perman_algo="13")
    with pytest.raises(ValueError, match="unknown"):
        sp.permanent(path, perman_algo="9", approximation=True)
    with pytest.raises(ValueError, match="unknown"):
        sp.permanent(path, perman_algo="nonsense")


def test_grid_multip_wired():
    """-e/grid_multip over-decomposes the chunk plan (reference grid-dim
    multiplier, revised gpu_exact_dense.cu:902-905) and keeps the result
    bitwise identical for int matrices."""
    rng = np.random.default_rng(7)
    a = random_int_matrix(rng, 21, 0.5, vmax=2)
    import superman_tpu as sp
    base = sp.permanent(a, calc="df64", lanes=128)
    multi = sp.permanent(a, calc="df64", lanes=128, grid_multip=4)
    assert multi.meta["chunks"] == 4 * base.meta["chunks"]
    # different r -> different partial grouping: df64-tolerance equality
    # (bitwise holds only for identical grouping, see test_sharding.py)
    assert multi.permanent == pytest.approx(base.permanent, rel=1e-10)


def test_run_does_not_mutate_caller_flags(rng):
    """run() resolves id behavior into a private Flags copy (round-2
    advisor: sparse/hybrid/perman_algo used to stick to the caller's
    object, so a reused Flags drifted between permanent() calls)."""
    import dataclasses

    import numpy as np

    from superman_tpu.core.flags import Flags
    from superman_tpu.core.matrix import DenseMatrix
    from superman_tpu.drivers.runner import run

    a = np.asarray((rng.random((8, 8)) < 0.7) * 1, dtype=np.int64)
    f = Flags(perman_algo=2, approximation=True, number_of_times=200,
              seed=3)
    before = dataclasses.asdict(f)
    r1 = run(DenseMatrix(a, "int"), f)
    after = dataclasses.asdict(f)
    before.pop("algo_name"), after.pop("algo_name")  # reporting field
    assert before == after
    r2 = run(DenseMatrix(a, "int"), f)
    assert r1.algo_name == r2.algo_name


def test_device_one_means_single_device():
    """-d 1 must run single-device (mesh None), not silently clamp to a
    2-device mesh, even for a multi-device algorithm id."""
    p = build_parser()
    flags = flags_from_args(p.parse_args(["-f", "x", "-p", "5", "-d", "1"]))
    assert flags.mesh_shape is None
    flags2 = flags_from_args(p.parse_args(["-f", "x", "-p", "5", "-d", "4"]))
    assert flags2.mesh_shape == (4,)


def test_sparse_matrix_input_keeps_int_storage(rng):
    """A SparseMatrix built from integer data must densify as type 'int'
    (exact-f32/tf96 tiers stay available), matching the ndarray path."""
    from superman_tpu.core.matrix import matrix2compressed
    import superman_tpu as sp
    a = random_int_matrix(rng, 10, 0.5, vmax=4)
    sm = matrix2compressed(DenseMatrix(a, "int"))
    want = float(perman_brute(a))
    r = sp.permanent(sm, calc="tf96")
    assert r.permanent == pytest.approx(want, rel=1e-9)
    import warnings as _w
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        sp.permanent(sm, calc="tf96")
        assert not any("falling back" in str(x.message) for x in rec)
