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
#: native CPU (single-core host) cross-check bound; 37 keeps cage5_c2
#: (double-typed, so tf96 falls back to df64 and cannot arbitrate it)
#: under an independent engine at ~1 min of single-core SkipPer
NATIVE_MAX_N = 37


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
    # rows stream to .partial (a kill keeps the evidence); the final
    # rename keeps the evidence guard from reading an in-flight file
    out_f = open(out_path + ".partial", "w")

    def emit(row):
        rows.append(row)
        out_f.write(json.dumps(row) + "\n")
        out_f.flush()

    files = corpus()
    # exact classes first (known compile behavior); big estimator-only
    # files last, so a backend wedge cannot lose the exact evidence
    def _ord(p):
        with open(p) as fh:
            for line in fh:
                if not line.startswith("%"):
                    return int(line.split()[0])
    files = sorted(files, key=_ord)
    if quick:
        files = files[:4]          # smoke mode: the 4 smallest orders
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
            emit({**base, "class": "Z", "config": "compression",
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
            # sparse-feasible core (e.g. will57: n=57, d1/d2 core n=49
            # whose live fraction is <1% at deep r): exact via the
            # compression driver + pruned sparse engine
            cls = "C"
            if core_n <= EXACT_MAX_N + 12:
                from ..ops.pruning import plan_sparse
                spn = plan_sparse(core, df=True)
                if spn is not None:
                    est = ((1.0 - spn.dead_frac) * (1 << (core_n - 1))
                           / 4.5e9)
                    if est < 1200:
                        cls = "B2"
                        log(f"{name}: sparse-feasible core (n={core_n}, "
                            f"dead={spn.dead_frac:.3f}, est {est:.0f} s)")

        if cls == "B2":
            # exact, arbitrated by a faster independent tier (f32k) at
            # its contract; df64 is the canonical recorded value
            vals = {}
            for cfg, kw in [("compression", {"compression": True}),
                            ("compression_f32k",
                             {"compression": True, "calc": "f32k"})]:
                t0 = time.perf_counter()
                try:
                    r = sp.permanent(path, **kw)
                    vals[cfg] = (float(r.permanent),
                                 time.perf_counter() - t0)
                except Exception as e:
                    vals[cfg] = (None, time.perf_counter() - t0)
                    log(f"{name}/{cfg}: EXCEPTION {e!r}")
            ref_val = vals["compression"][0]
            for cfg, (v, w) in vals.items():
                if v is None or ref_val is None:
                    status, rel = "EXCEPTION", None
                else:
                    rel = _rel(v, ref_val)
                    status = "ok" if rel <= 1e-3 else "FAIL"
                emit({**base, "class": cls, "config": cfg,
                             "value": v, "wall_s": round(w, 3),
                             "status": status, "rel_err_vs_ref": rel,
                             "ref_value": ref_val,
                             "ref_source": "df64_vs_f32k_cross"})
                failures += status != "ok"
                log(f"{name}/{cfg}: {v} rel={rel} [{status}] {w:.0f}s")
            continue

        if cls in ("A", "B"):
            # exact DFS on the folded core — engine-independent truth
            # (d1/d2 folding preserves the permanent exactly)
            ref_val, ref_src = None, None
            # DFS cost explodes unpredictably past ~18 rows; larger
            # cores are arbitrated by native_double / tf96 instead
            if core_n <= 18:
                t0 = time.perf_counter()
                ref_val = float(perman_brute(core))
                ref_src = f"dfs_core_n{core_n}"
                log(f"{name}: core DFS per = {ref_val:.12e} "
                    f"({time.perf_counter() - t0:.1f} s)")
            # TPU configs run calc="auto": real matrices carry real
            # cancellation (measured: chesapeake's raw df64 walk is
            # ~1.3e-5 off at n=39 — amplification ~2^33), and auto's
            # escalation probe exists exactly for that.  The suite
            # therefore validates the tier LADDER end-to-end, not a
            # fixed tier's conditional contract.
            au = {"calc": "auto"}
            configs = ([("direct", dict(au)),
                        ("sparse", {"sparse": True, "preprocessing": 2,
                                    **au}),
                        ("compression", {"compression": True, **au}),
                        ("scaling", {"scaling_threshold": 2.0,
                                     "compression": True, **au})]
                       if cls == "A" else
                       [("compression", {"compression": True, **au}),
                        ("compression_scaling",
                         {"compression": True, "scaling_threshold": 2.0,
                          **au})])
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
                # arbiter precedence: exact DFS (above) > tf96 (int
                # matrices only — the tier silently falls back to df64
                # on non-exact storage, which would be self-arbitration)
                # > native C++ double (independent engine, ~amp * 2^-53)
                ints = bool(np.all(a == np.round(a))
                            and np.abs(a).max() < 2 ** 22)
                if ints:
                    t0 = time.perf_counter()
                    r = sp.permanent(path, calc="tf96")
                    ref_val, ref_src = float(r.permanent), "tpu_tf96"
                    log(f"{name}: tf96 arbiter = {ref_val:.12e} "
                        f"({time.perf_counter() - t0:.1f} s)")
                elif ("native_double" in vals
                      and vals["native_double"][0] is not None):
                    ref_val, ref_src = (vals["native_double"][0],
                                        "native_double")
                else:
                    t0 = time.perf_counter()
                    r = sp.permanent(path, calc="f64")
                    ref_val, ref_src = float(r.permanent), "host_f64"
                    log(f"{name}: host f64 arbiter = {ref_val:.12e} "
                        f"({time.perf_counter() - t0:.1f} s)")
            for cfg, (v, w) in vals.items():
                if v is None:
                    status, rel = "EXCEPTION", None
                else:
                    rel = _rel(v, ref_val)
                    # tier contracts vs the arbiter: auto targets 1e-9
                    # but the comparison inherits the arbiter's own
                    # limits — native double carries ~amp * 2^-53
                    # (measured ~1e-6-class on badly conditioned files),
                    # so walks compared AGAINST it get a double-class
                    # band, and the native row compared against tf96
                    # does too.  Transforms merge entries (d2 products
                    # concentrate magnitudes): wider, catastrophe-proof.
                    if cfg in ("direct", "sparse"):
                        tol = (1e-7 if ref_src == "tpu_tf96"
                               or ref_src.startswith("dfs_core")
                               else 1e-6)
                    elif cfg == "native_double":
                        tol = 1e-5
                    else:
                        tol = 1e-5
                    status = "ok" if rel <= tol else "FAIL"
                emit({**base, "class": cls, "config": cfg,
                             "value": v, "wall_s": round(w, 3),
                             "status": status, "rel_err_vs_ref": rel,
                             "ref_value": ref_val, "ref_source": ref_src})
                failures += status != "ok"
                log(f"{name}/{cfg}: {v} rel={rel} [{status}]")
        else:
            # class C: estimator consistency across independent seeds
            trials = 20000 if quick else 100000
            # agreement is checked in LOG space: bcsstk01-scale
            # permanents (~1e400) overflow f64, but log2_estimate and
            # the relative stderr are always finite
            ests = []
            for seed in (11, 12):
                t0 = time.perf_counter()
                r = sp.permanent(path, approximation=True,
                                 perman_algo="scaling", smc=1,
                                 number_of_times=trials, seed=seed)
                ests.append((float(r.meta["log2_estimate"]),
                             float(r.meta.get("stderr_rel") or 0.0),
                             time.perf_counter() - t0))
                log(f"{name}/est seed={seed}: log2 = {ests[-1][0]:.4f} "
                    f"rel ± {ests[-1][1]:.3f} ({ests[-1][2]:.0f} s)")
            (l1, s1, w1), (l2, s2, w2) = ests
            ln2 = float(np.log(2.0))
            sig_l2 = ((s1 / ln2) ** 2 + (s2 / ln2) ** 2) ** 0.5
            ok = (np.isfinite(l1) and np.isfinite(l2)
                  and (sig_l2 == 0 or abs(l1 - l2) <= 3.0 * sig_l2))
            emit({**base, "class": "C", "config": "estimator_x2",
                  "log2_value": l1, "log2_value2": l2,
                  "stderr_rel": s1, "stderr_rel2": s2,
                  "wall_s": round(w1 + w2, 3),
                  "status": "ok" if ok else "FAIL",
                  "trials": trials,
                  "ref_source": "seed_agreement_3sigma_log2"})
            failures += not ok
    out_f.close()
    os.replace(out_path + ".partial", out_path)
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
