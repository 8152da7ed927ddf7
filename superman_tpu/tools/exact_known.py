"""Build EXACT_KNOWN.jsonl: certified exact permanents of the reference
corpus (SURVEY §4.3 known-answer mechanism, done properly).

The reference ships its real matrices with NO recorded values; worse, on
cancellation-bound files (pores_1_r: amplitude ~2^280 over |per|) every
fixed-precision engine it has — double AND __float128 — returns noise.
The modular-CRT engine (ops/exact.py) computes the true integer
permanent with an end-to-end held-out-prime certificate, giving this
corpus its first actual known answers.  real_suite.py arbitrates
against these rows.

Run:  python -m superman_tpu.tools.exact_known [--out EXACT_KNOWN.jsonl]
      [--budget SECONDS] [--files SUBSTR ...] [--merge]

--merge keeps existing rows (skipping their files) so a TPU host can
extend the table with just the big cores the CPU walk cannot reach
(chesapeake core n=39, cage5_c2 n=37, will57 core n=49 — ops/modp.py)
without re-paying the 23 minutes of already-certified CPU rows.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="EXACT_KNOWN.jsonl")
    p.add_argument("--budget", type=float, default=2000.0,
                   help="per-file cost-estimate cap in seconds")
    p.add_argument("--files", nargs="*", default=None,
                   help="only files whose name contains one of these")
    p.add_argument("--merge", action="store_true",
                   help="keep existing rows; only compute missing files")
    args = p.parse_args(argv)

    from ..io.matrixmarket import read_any
    from ..ops import exact
    from .real_suite import corpus

    done = {}
    if args.merge and os.path.exists(args.out):
        for line in open(args.out):
            row = json.loads(line)
            done[row["file"]] = line.rstrip("\n")

    out = open(args.out + ".partial", "w")
    for line in done.values():
        out.write(line + "\n")
    for path in corpus():
        name = os.path.basename(path)
        if name in done:
            continue
        if args.files and not any(s in name for s in args.files):
            continue
        a = np.asarray(read_any(path, 0, 0, 0).mat, np.float64)
        secs, npr, core_n = exact.exact_cost_estimate(a)
        if secs > args.budget:
            print(f"{name}: skipped (est {secs:.0f} s, core n={core_n})",
                  flush=True)
            continue
        t0 = time.time()
        frac, meta = exact.perman_exact_fraction(
            a, log=lambda s: print(f"  {name}: {s}", flush=True),
            checkpoint_path=args.out + f".ck.{name}.jsonl")
        val = exact._float_of_fraction(frac)
        sign, l2 = ((0.0, None) if frac == 0 else
                    (1.0 if frac > 0 else -1.0,
                     exact.log2_abs_fraction(frac)))
        num = str(frac.numerator)
        row = {"file": name, "n": int(a.shape[0]),
               "core_n": meta["core_n"], "nprimes": meta.get("nprimes"),
               "k": meta["k"], "value": val, "sign": sign,
               "log2_abs": l2,
               "numerator": num if len(num) <= 400 else num[:40] + "...",
               "denominator_log2": meta["k"] * int(a.shape[0]),
               "wall_s": round(time.time() - t0, 2),
               "engine": meta.get("engine")}
        out.write(json.dumps(row) + "\n")
        out.flush()
        ck = args.out + f".ck.{name}.jsonl"
        if os.path.exists(ck):
            os.remove(ck)           # row certified; residues obsolete
        print(f"{name}: per = {val:.12e} (core n={meta['core_n']}, "
              f"{row['wall_s']} s)", flush=True)
    out.close()
    os.replace(args.out + ".partial", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
