"""Accuracy-sweep harness: run a config matrix, check cross-config agreement.

Parity: the reference's accuracy harness
(revised_perman/accuracy_test/accuracy_test.py generates CLI command sweeps
over {algo} x {precision -h/-q/-w/-v} x {grid size} x {scaling -u};
generate_scripts.py wraps each into out_N_<cfg>.stdtxt captures).  The
comparison step there is manual (eyeballing stdtxt diffs); here the sweep
runner ALSO verifies agreement automatically: every config computes the
same scalar, so the most accurate config (highest calc precision, no
estimator) is the oracle and every other exact config must agree to its
documented tolerance.

CLI:
    python -m superman_tpu.tools.accuracy -f FILE [-f FILE...] \
        [--out report.jsonl] [--quick]

Each line of the report: {"file", "config", "permanent", "time",
"algo_name", "agrees", "rel_err"}.
"""

from __future__ import annotations

import argparse
import json
import sys

# (name, overrides, rel_tol vs oracle); None tol = estimator (not checked
# for agreement, only recorded)
SWEEP = [
    ("exact_df64", dict(calc="df64"), 1e-9),
    ("exact_f32", dict(calc="f32"), 5e-2),
    ("exact_f64_host", dict(calc="f64"), 1e-9),
    ("exact_sparse_auto", dict(sparse=True, calc="df64"), 1e-9),
    ("exact_sparse_sort", dict(sparse=True, preprocessing=1,
                               calc="df64"), 1e-9),
    ("exact_sparse_skip", dict(sparse=True, preprocessing=2,
                               calc="df64"), 1e-9),
    ("exact_compressed", dict(compression=True, calc="df64"), 1e-9),
    ("exact_glynn", dict(perman_algo="glynn", calc="df64"), 1e-8),
    ("exact_tf96", dict(calc="tf96"), 1e-9),
    ("exact_scaled_u2", dict(scaling_threshold=2.0, calc="df64"), 1e-7),
    ("approx_rasmussen", dict(approximation=True,
                              perman_algo="rasmussen",
                              number_of_times=200000), None),
    ("approx_scaling", dict(approximation=True, perman_algo="scaling",
                            number_of_times=50000), None),
]

QUICK = {"exact_df64", "exact_f32", "exact_sparse_auto",
         "exact_scaled_u2", "approx_scaling"}

ORACLE = "exact_df64"


def run_sweep(files, quick=False, out=None, log=print):
    import superman_tpu as sp

    records = []
    for path in files:
        oracle_val = None
        for name, overrides, tol in SWEEP:
            if quick and name not in QUICK:
                continue
            try:
                res = sp.permanent(path, **dict(overrides))
            except Exception as e:           # noqa: BLE001 — recorded
                rec = {"file": path, "config": name, "error": str(e)}
                records.append(rec)
                log(json.dumps(rec))
                continue
            rec = {"file": path, "config": name,
                   "permanent": res.permanent,
                   "time": round(res.time, 4), "algo_name": res.algo_name}
            if name == ORACLE:
                oracle_val = res.permanent
            if tol is not None and oracle_val is not None:
                rel = (abs(res.permanent - oracle_val) /
                       max(abs(oracle_val), 1e-300))
                rec["rel_err"] = float(f"{rel:.3e}")
                rec["agrees"] = rel <= tol
            records.append(rec)
            log(json.dumps(rec))
    if out:
        with open(out, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
    bad = [r for r in records if r.get("agrees") is False or "error" in r]
    return records, bad


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="superman-accuracy")
    p.add_argument("-f", "--file", action="append", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--quick", action="store_true")
    args = p.parse_args(argv)
    records, bad = run_sweep(args.file, quick=args.quick, out=args.out)
    if bad:
        print(f"ACCURACY SWEEP: {len(bad)} config(s) FAILED agreement",
              file=sys.stderr)
        return 1
    print(f"ACCURACY SWEEP: all {len(records)} records agree")
    return 0


if __name__ == "__main__":
    sys.exit(main())
