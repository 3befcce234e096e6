#!/usr/bin/env python3
"""Verified-idle bench protocol: probe-until-quiet, run, re-verify.

This box has chronic intermittent neighbor load (r8 finding: busy-loop
probes 1.10-1.35x the idle references for 40+ minute stretches), and a
bench artifact timed under load is a contaminated measurement even when
per-query spreads look clean. "Number of record" selection must therefore
be mechanical, not asserted:

  1. PROBE: time the same single-thread and 16-process busy loops bench.py
     uses. The box is "quiet" only when BOTH read under QUIET_LIMIT (1.15x,
     deliberately tighter than bench.py's 1.3x contended flag) of their
     idle references.
  2. RUN: only from a quiet probe, run bench.py (which re-probes before and
     after the suite itself).
  3. ACCEPT: only if the emitted artifact says contended=false AND
     suspect=false — i.e. the box stayed quiet through the run.

Repeats up to --max-attempts with --sleep-sec between probes; exits 0 with
the artifact on stdout-path only when a doubly-clean run lands. Exits 3 if
no quiet window appears (cite the LAST CLEAN committed artifact instead of
timing under load).

Usage:
  python tools/bench_protocol.py --out BENCH_builder_r09_idle.json
  python tools/bench_protocol.py --probe-only     # one probe, report, exit
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_protocol.py ...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402  (reuses the exact calibration loops + references)

QUIET_LIMIT = 1.15


def probe() -> tuple[float, float, bool]:
    st = bench._calibrate()
    mt = bench._calibrate_mt()
    quiet = (
        st <= QUIET_LIMIT * bench.CALIB_REF_SEC
        and mt <= QUIET_LIMIT * bench.CALIB_MT_REF_SEC
    )
    return round(st, 3), round(mt, 3), quiet


def main() -> int:
    args = sys.argv[1:]
    out = "BENCH_protocol.json"
    max_attempts = 20
    sleep_sec = 120.0
    if "--out" in args:
        out = args[args.index("--out") + 1]
    if "--max-attempts" in args:
        max_attempts = int(args[args.index("--max-attempts") + 1])
    if "--sleep-sec" in args:
        sleep_sec = float(args[args.index("--sleep-sec") + 1])
    probe_only = "--probe-only" in args

    for attempt in range(1, max_attempts + 1):
        st, mt, quiet = probe()
        print(
            f"[probe {attempt}/{max_attempts}] st={st}s (ref {bench.CALIB_REF_SEC}) "
            f"mt={mt}s (ref {bench.CALIB_MT_REF_SEC}) -> "
            f"{'QUIET' if quiet else 'LOADED'}",
            flush=True,
        )
        if probe_only:
            return 0 if quiet else 3
        if not quiet:
            time.sleep(sleep_sec)
            continue
        print("[run] box quiet, starting bench.py", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            capture_output=True,
            text=True,
        )
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            artifact = json.loads(line)
        except json.JSONDecodeError:
            print(f"[run] bench.py produced no JSON (rc={r.returncode}); "
                  f"stderr tail: {r.stderr[-500:]}", flush=True)
            time.sleep(sleep_sec)
            continue
        clean = not artifact.get("contended") and not artifact.get("suspect")
        print(
            f"[run] total={artifact.get('value')}s contended="
            f"{artifact.get('contended')} suspect={artifact.get('suspect')} "
            f"-> {'ACCEPT' if clean else 'REJECT'}",
            flush=True,
        )
        if clean:
            with open(os.path.join(ROOT, out), "w") as f:
                json.dump(artifact, f)
                f.write("\n")
            print(f"[done] clean artifact written to {out}", flush=True)
            return 0
        time.sleep(sleep_sec)
    print("[fail] no doubly-clean window found; cite the last clean "
          "committed artifact instead", flush=True)
    return 3


if __name__ == "__main__":
    sys.exit(main())
