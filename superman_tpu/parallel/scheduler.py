"""Hybrid dynamic chunk scheduler: TPU + native-CPU workers over one queue.

Parity: the reference's dynamic chunked multi-GPU+CPU load balancer
(`gpu_perman64_*_multigpucpu_chunks`, gpu_exact_dense.cu:776-896): the
Gray-code range is over-decomposed into work units; `gpu_num+1` OpenMP
threads pull unit ids from a shared counter under `#pragma omp critical`,
with thread `gpu_num` running the OpenMP CPU kernel.  TPU-native redesign:

* one Python worker thread drives the (possibly mesh-sharded) Pallas
  engine, an optional second drives the native C++ OpenMP engine
  (native/perman_cpu.cpp: sup_perman_dense_chunks) — both pull unit ids
  from a lock-protected counter (the GIL is released inside both device
  execution and the ctypes call, so the workers genuinely overlap);
* per-unit progress logs mirror "ChunkID k is DONE by kernel i in t"
  (gpu_exact_dense.cu:876);
* each finished unit is journaled to an optional checkpoint file, so a
  killed run resumes by replaying the journal and skipping finished units
  (the reference has no checkpointing; its chunked scheduler is already
  shaped for it — SURVEY.md §5);
* a unit that raises is retried (up to 3 attempts) before the run is
  failed with the offending unit id — failure detection the reference
  lacks (it exit(1)s);
* the reference's manual static distribution (hard-coded 3/8,3/8,1/8,1/8
  fractions for a heterogeneous box,
  gpu_exact_dense.cu:941-968) is subsumed: dynamic pulling gives every
  worker exactly the fraction it can sustain, with no hand tuning.

Exactness: unit partials are raw Gray-term sums over the row-scaled
matrix; for integer matrices every partial is exactly representable, so
the final float64 sum is independent of which worker computed what.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..ops import gray
from ..utils import trace


@dataclass
class HybridStats:
    units_total: int = 0
    units_tpu: int = 0
    units_cpu: int = 0
    units_resumed: int = 0
    retries: int = 0


def _journal_key(a_s: np.ndarray, r: int) -> str:
    h = hashlib.sha256(np.ascontiguousarray(a_s).tobytes()).hexdigest()[:16]
    return f"{a_s.shape[0]}:{r}:{h}"


class _Journal:
    """Append-only checkpoint of (block range -> raw partial sum)."""

    def __init__(self, path: Optional[str], key: str):
        self.path = path
        self.key = key
        self.done: dict[tuple, float] = {}
        self._f = None
        if not path:
            return
        if os.path.exists(path):
            try:
                with open(path) as f:
                    head = json.loads(f.readline())
                    if head.get("key") == key:
                        for line in f:
                            rec = json.loads(line)
                            self.done[(int(rec["start"]),
                                       int(rec["count"]))] = \
                                float(rec["value"])
                    else:
                        trace.log(f"checkpoint {path}: key mismatch, "
                                  "starting fresh", level=1)
            except (ValueError, OSError, KeyError) as e:
                trace.log(f"checkpoint {path}: unreadable ({e}), "
                          "starting fresh", level=1)
                self.done = {}
        mode = "a" if self.done else "w"
        self._f = open(path, mode)
        if mode == "w":
            self._f.write(json.dumps({"key": key}) + "\n")
            self._f.flush()

    def record(self, start: int, count: int, value: float, by: str,
               dt: float) -> None:
        if self._f is None:
            return
        self._f.write(json.dumps({"start": start, "count": count,
                                  "value": value, "by": by,
                                  "t": round(dt, 4)}) + "\n")
        self._f.flush()
        os.fsync(self._f.fileno())

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None


def compute_partials_hybrid(
        a_s: np.ndarray, ids_blocks: np.ndarray, x0_pair, cols_pair,
        colst_hi, colst_lo, plan: "gray.RyserPlan", *,
        df: bool, exact_storage: bool, mesh=None, kahan: bool = False,
        interpret: bool = False,
        threads: int = 16, cpu_helper: bool = True,
        checkpoint_path: Optional[str] = None,
        unit_blocks: Optional[int] = None):
    """Dynamic-chunked partial-sum computation.

    Returns (total, HybridStats).  `total` is the raw sum of Gray terms
    (no (4*(n&1)-2) factor, no 2**E unscaling) — same convention as
    parallel.sharding.compute_partials.
    """
    from .sharding import compute_partials

    B = ids_blocks.shape[0]
    num_shards = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    if unit_blocks is None:
        # over-decompose ~8 units per worker, but keep units shard-aligned
        workers = 2 if cpu_helper else 1
        unit_blocks = max(num_shards, B // max(1, 8 * workers))
    unit_blocks = -(-max(unit_blocks, num_shards) // num_shards) * num_shards
    # the CPU worker pulls FINER units so a slow CPU grab near the end
    # cannot stall the finish (measured: a coarse CPU unit idled the TPU
    # for seconds in the tail)
    cpu_blocks = max(num_shards, unit_blocks // 8)

    journal = _Journal(checkpoint_path, _journal_key(a_s, plan.r))
    covered = np.zeros(B, dtype=bool)
    resumed_total = 0.0
    for (start, count), value in journal.done.items():
        covered[start:start + count] = True
        resumed_total += value
    stats = HybridStats(units_resumed=len(journal.done))
    stats.units_total = len(journal.done)

    lock = threading.Lock()
    pos = [0]
    results: dict[int, float] = {}
    failures: list[tuple[int, str, BaseException]] = []

    def pull(k: int) -> Optional[tuple[int, int]]:
        """Next run of up to k uncovered contiguous blocks."""
        with lock:
            p = pos[0]
            while p < B and covered[p]:
                p += 1
            if p >= B:
                pos[0] = B
                return None
            start = p
            while p < B and not covered[p] and p - start < k:
                p += 1
            covered[start:p] = True        # claimed
            pos[0] = p
            return start, p

    def run_tpu_unit(start: int, end: int) -> float:
        blk = ids_blocks[start:end]
        # pad every unit to the same (unit_blocks, L) shape: one compiled
        # kernel serves the whole run (sentinel -1 lanes contribute 0)
        pad = unit_blocks - len(blk)
        if pad:
            blk = np.concatenate(
                [blk, np.full((pad, blk.shape[1]), -1, np.int32)])
        out = compute_partials(blk, x0_pair, cols_pair, colst_hi, colst_lo,
                               plan, df=df, exact_storage=exact_storage,
                               mesh=mesh, kahan=kahan, interpret=interpret)
        return float(out.sum(dtype=np.float64))

    def run_cpu_unit(start: int, end: int) -> float:
        from ..bindings.native import perman_dense_chunks
        ids = ids_blocks[start:end].ravel()
        ids = ids[ids >= 0].astype(np.int64)
        if len(ids) == 0:
            return 0.0
        return perman_dense_chunks(a_s, ids, plan.r, threads)

    def worker(kind: str, fn, k: int):
        while True:
            item = pull(k)
            if item is None:
                return
            start, end = item
            t0 = time.perf_counter()
            value = None
            for attempt in range(3):
                try:
                    value = fn(start, end)
                    break
                except Exception as e:          # noqa: BLE001 — retried
                    with lock:
                        stats.retries += 1
                    trace.log(f"blocks [{start},{end}) failed on {kind} "
                              f"(attempt {attempt + 1}): {e}", level=1)
                    err = e
            if value is None:
                with lock:
                    failures.append((start, kind, err))
                return
            dt = time.perf_counter() - t0
            with lock:
                results[start] = value
                stats.units_total += 1
                if kind == "tpu":
                    stats.units_tpu += 1
                else:
                    stats.units_cpu += 1
                journal.record(start, end - start, value, kind, dt)
            trace.log(f"blocks [{start},{end}) DONE by {kind} "
                      f"in {dt:.4f}s", level=2)

    tpu_thread = threading.Thread(
        target=worker, args=("tpu", run_tpu_unit, unit_blocks),
        name="hybrid-tpu")
    threads_list = [tpu_thread]
    if cpu_helper:
        from ..bindings.native import native_available
        if native_available():
            threads_list.append(threading.Thread(
                target=worker, args=("cpu", run_cpu_unit, cpu_blocks),
                name="hybrid-cpu"))
        else:
            trace.log("hybrid: native CPU engine unavailable, "
                      "running TPU-only", level=1)
    for t in threads_list:
        t.start()
    for t in threads_list:
        t.join()
    journal.close()

    if failures:
        start, kind, err = failures[0]
        raise RuntimeError(
            f"hybrid scheduler: blocks at {start} failed on {kind} worker "
            f"after retries: {err}") from err
    if pos[0] < B or (not failures and not covered.all()):
        raise RuntimeError("hybrid scheduler: blocks never completed")
    total = resumed_total + float(np.sum(np.fromiter(
        (results[s] for s in sorted(results)), dtype=np.float64)))
    return total, stats
