"""Capture a bench.py run into BENCH_r{N}.json (driver record format).

The driver snapshots `python bench.py` at the END of each round; round 3
proved that leaves a whole round's perf claims resting on a single
untested capture (BENCH_r03.json: rc=1, TPU backend outage, suite red —
round-3 verdict item 1).  This tool takes the same record DURING the
round, as soon as the worker is healthy, so the evidence exists and the
bench guard (tests/test_evidence.py) can pass before the driver's own
end-of-round capture replaces the file with a fresher one.

Run:  python -m superman_tpu.tools.capture_bench [--n 4] [--out PATH]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4, help="round number")
    p.add_argument("--out", default=None)
    p.add_argument("--timeout", type=float, default=3600.0)
    args = p.parse_args(argv)
    out_path = args.out or os.path.join(ROOT, f"BENCH_r{args.n:02d}.json")

    cmd = "if [ -f bench.py ]; then python bench.py; else exit 0; fi"
    try:
        proc = subprocess.run(["bash", "-c", cmd], cwd=ROOT,
                              capture_output=True, text=True,
                              timeout=args.timeout)
        rc, stdout, stderr = proc.returncode, proc.stdout, proc.stderr
    except subprocess.TimeoutExpired as e:
        # the known wedged-worker mode: bench hangs rather than erroring.
        # Record it loudly (rc=-1) so the evidence guard can cite the
        # failed capture instead of the tool crashing with no record.
        rc = -1
        stdout = (e.stdout or b"").decode(errors="replace") \
            if isinstance(e.stdout, bytes) else (e.stdout or "")
        stderr = f"capture_bench: bench.py hung past {args.timeout:.0f}s"
    tail = (stdout + stderr)[-4000:]
    parsed = None
    for line in stdout.splitlines()[::-1]:
        line = line.strip()
        if line.startswith("{"):
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "vs_baseline" in cand:
                parsed = cand
                break
    rec = {"n": args.n, "cmd": cmd, "rc": rc,
           "tail": tail, "parsed": parsed}
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=2)
    ok = rc == 0 and parsed is not None
    print(f"{os.path.basename(out_path)}: rc={rc} "
          f"parsed={'yes' if parsed else 'NO'}"
          + (f" value={parsed['value']} vs_baseline={parsed['vs_baseline']}"
             if parsed else ""))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
