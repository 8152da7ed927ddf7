"""Known-answer real-matrix validation suite (SURVEY §4.3).

The reference's third test mechanism is its corpus of real matrices:
``revised_perman/elektrik_matrices/known_perman/`` (6 .mtx),
``real/`` (4 v1 .mtxzero triplets) and ``revised_perman/matrices/``
(15 small real-world .mtx).  These have exactly the degree-1/2 structure
and magnitude spread the compression / scaling drivers exist for, so they
are the highest-value validation data for the most failure-prone paths
(round-2 verdict, missing #1).

No absolute "known" values ship with the reference, so truth is
established by cross-engine arbitration, the same policy the fuzzer uses
(tools/fuzz.py): independent engines — TPU Pallas df64, TPU tf96, the
native C++ double/quad walks, and an exact DFS on the d1/d2-compressed
core where it fits — must agree within their tier contracts.

Per-file plan:

* class A (exact feasible: n <= 39): direct, sparse, compression,
  scaling configs on the accelerator + a native CPU double run as the
  independent reference; high-precision arbitration via tf96.
* class B (n > 39 but the d1/d2 fixed-point core is small — d_ss,
  impcol_b): compression-driver configs only, arbitrated against an
  exact DFS permanent of the manually folded core.
* class C (exact infeasible — bcsstk01, dwt_59, will57): structural
  permanent!=0 check via maximum matching (Dulmage–Mendelsohn machinery)
  and two independent-seed scaling-estimator runs that must agree
  within 3 sigma.

Writes SUITE_REPORT_REAL.jsonl; tests/test_evidence.py pins the results.

Run:  python -m superman_tpu.tools.real_suite [--out PATH] [--quick]
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np

KNOWN_DIR = "/root/reference/revised_perman/elektrik_matrices/known_perman"
REAL_DIR = "/root/reference/real"
SMALL_DIR = "/root/reference/revised_perman/matrices"

#: dense-walk feasibility bound: 2^(n-1) iters at ~4.5 G/s, capped ~30 s
EXACT_MAX_N = 39
#: native CPU (single-core host) cross-check bound
NATIVE_MAX_N = 36


def corpus():
    return (sorted(glob.glob(os.path.join(KNOWN_DIR, "*.mtx")))
            + sorted(glob.glob(os.path.join(REAL_DIR, "*.mtxzero")))
            + sorted(glob.glob(os.path.join(SMALL_DIR, "*.mtx"))))


def _core_fixed_point(a: np.ndarray) -> np.ndarray:
    """Fold d1/d2 compressions to a fixed point (value-preserving)."""
    from ..prep.compression import (d1compress, d2compress, has_empty_line,
                                    min_degree)
    b = np.asarray(a, np.float64).copy()
    while b.shape[0] > 2 and not has_empty_line(b):
        md = min_degree(b)
        nb = d1compress(b) if md == 1 else (
            d2compress(b) if md == 2 else None)
        if nb is None:
            break
        b = nb
    return b


def _has_perfect_matching(a: np.ndarray) -> bool:
    from ..prep.dulmage_mendelsohn import max_bipartite_matching
    m = max_bipartite_matching((a != 0).astype(np.int8))
    return int(np.sum(np.asarray(m) >= 0)) == a.shape[0]


def _rel(x: float, ref: float) -> float:
    if ref == 0:
        return abs(x)
    return abs(x - ref) / abs(ref)


def run_suite(out_path: str = "SUITE_REPORT_REAL.jsonl",
              quick: bool = False, log=print) -> int:
    import superman_tpu as sp
    from ..io.matrixmarket import read_any
    from ..ops.oracle import perman_brute

    failures = 0
    rows = []
    files = corpus()
    if quick:
        # smoke mode (CPU-friendly): the 4 smallest-order files only
        def _order(p):
            with open(p) as f:
                for line in f:
                    if not line.startswith("%"):
                        return int(line.split()[0])
        files = sorted(files, key=_order)[:4]
    for path in files:
        name = os.path.basename(path)
        dm = read_any(path, 0, 0, 0)
        a = np.asarray(dm.mat, np.float64)
        n = a.shape[0]
        nnz = int((a != 0).sum())
        core = _core_fixed_point(a)
        core_n = int(core.shape[0])
        base = {"file": name, "n": n, "nnz": nnz,
                "density": round(nnz / n ** 2, 4), "core_n": core_n}
        matchable = _has_perfect_matching(a)
        if not matchable:
            # structurally singular: every engine must return 0
            r = sp.permanent(a, compression=True)
            ok = r.permanent == 0.0
            rows.append({**base, "class": "Z", "config": "compression",
                         "value": r.permanent, "wall_s": round(r.time, 3),
                         "status": "ok" if ok else "FAIL",
                         "ref_value": 0.0, "ref_source": "no_perfect_matching"})
            failures += not ok
            log(f"{name}: structurally singular, engine says {r.permanent}")
            continue

        if n <= EXACT_MAX_N:
            cls = "A"
        elif core_n <= 30:
            cls = "B"
        else:
            cls = "C"

        if cls in ("A", "B"):
            # exact DFS on the folded core — engine-independent truth
            # (d1/d2 folding preserves the permanent exactly)
            ref_val, ref_src = None, None
            if core_n <= 26:
                t0 = time.perf_counter()
                ref_val = float(perman_brute(core))
                ref_src = f"dfs_core_n{core_n}"
                log(f"{name}: core DFS per = {ref_val:.12e} "
                    f"({time.perf_counter() - t0:.1f} s)")
            configs = ([("direct", {}),
                        ("sparse", {"sparse": True, "preprocessing": 2}),
                        ("compression", {"compression": True}),
                        ("scaling", {"scaling_threshold": 2.0,
                                     "compression": True})]
                       if cls == "A" else
                       [("compression", {"compression": True}),
                        ("compression_scaling",
                         {"compression": True, "scaling_threshold": 2.0})])
            if cls == "A" and n <= NATIVE_MAX_N:
                configs.append(("native_double",
                                {"cpu": True, "gpu": False, "sparse": True,
                                 "preprocessing": 2}))
            if cls == "B":
                configs.append(("native_compression",
                                {"compression": True, "cpu": True,
                                 "gpu": False}))
            vals = {}
            for cfg, kw in configs:
                t0 = time.perf_counter()
                try:
                    r = sp.permanent(path, **kw)
                    vals[cfg] = (float(r.permanent),
                                 time.perf_counter() - t0)
                except Exception as e:   # a crash is a finding, not an abort
                    vals[cfg] = (None, time.perf_counter() - t0)
                    log(f"{name}/{cfg}: EXCEPTION {e!r}")
            if ref_val is None:
                # arbitrate by the native run if present, else tf96
                if "native_double" in vals and vals["native_double"][0] is not None:
                    ref_val, ref_src = vals["native_double"][0], "native_double"
                else:
                    t0 = time.perf_counter()
                    r = sp.permanent(path, calc="tf96")
                    ref_val, ref_src = float(r.permanent), "tpu_tf96"
                    log(f"{name}: tf96 arbiter = {ref_val:.12e} "
                        f"({time.perf_counter() - t0:.1f} s)")
            for cfg, (v, w) in vals.items():
                if v is None:
                    status, rel = "EXCEPTION", None
                else:
                    rel = _rel(v, ref_val)
                    # tier contract: df64-class engines vs the arbiter.
                    # compression merges entries (different grouping, and
                    # d2 products can concentrate magnitudes), so give
                    # transform pipelines a wider—but still catastrophic-
                    # proof—band than the direct walks.
                    tol = 1e-6 if cfg in ("direct", "sparse",
                                          "native_double") else 1e-4
                    status = "ok" if rel <= tol else "FAIL"
                rows.append({**base, "class": cls, "config": cfg,
                             "value": v, "wall_s": round(w, 3),
                             "status": status, "rel_err_vs_ref": rel,
                             "ref_value": ref_val, "ref_source": ref_src})
                failures += status != "ok"
                log(f"{name}/{cfg}: {v} rel={rel} [{status}]")
        else:
            # class C: estimator consistency across independent seeds
            trials = 20000 if quick else 100000
            ests = []
            for seed in (11, 12):
                t0 = time.perf_counter()
                r = sp.permanent(path, approximation=True,
                                 perman_algo="scaling",
                                 number_of_times=trials, seed=seed)
                ests.append((float(r.permanent),
                             r.meta.get("stderr") or 0.0,
                             time.perf_counter() - t0))
                log(f"{name}/est seed={seed}: {ests[-1][0]:.6e} "
                    f"± {ests[-1][1]:.2e} ({ests[-1][2]:.0f} s)")
            (v1, s1, w1), (v2, s2, w2) = ests
            sig = (s1 ** 2 + s2 ** 2) ** 0.5
            ok = (v1 > 0 and v2 > 0
                  and (sig == 0 or abs(v1 - v2) <= 3.0 * sig))
            rows.append({**base, "class": "C", "config": "estimator_x2",
                         "value": v1, "value2": v2,
                         "stderr": s1, "stderr2": s2,
                         "wall_s": round(w1 + w2, 3),
                         "status": "ok" if ok else "FAIL",
                         "trials": trials,
                         "ref_source": "seed_agreement_3sigma"})
            failures += not ok
    with open(out_path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    log(f"real suite: {len(rows)} rows, {failures} failures -> {out_path}")
    return failures


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="SUITE_REPORT_REAL.jsonl")
    p.add_argument("--quick", action="store_true")
    args = p.parse_args(argv)
    return 1 if run_suite(args.out, quick=args.quick) else 0


if __name__ == "__main__":
    raise SystemExit(main())
