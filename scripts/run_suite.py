"""Crash-isolated, two-tier test-suite runner (VERDICT r3 weak #7).

A transient XLA CPU-compile segfault zeroed a 17-minute single-process
full-suite run in round 3 (test #233, jax/_src/compiler.py — not
reproducible; the same file passes in isolation). This runner executes
each test FILE in its own pytest subprocess, so one compiler crash costs
one file, not the run — and a crashed file (SIGSEGV/SIGABRT/SIGBUS) is
retried once before being reported.

Tiers:
    --tier quick   deselects @pytest.mark.slow (multi-minute pipelines)
                   — the pre-commit tier, a few minutes
    --tier full    everything (default; ~17 min on this box's one core)

Usage:
    python scripts/run_suite.py                 # full, isolated
    python scripts/run_suite.py --tier quick
    python scripts/run_suite.py -k validation   # filter files by name
Exit status: 0 iff every file passed (after at most one crash retry).
"""

from __future__ import annotations

import argparse
import glob
import os
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CRASH_SIGS = {-signal.SIGSEGV, -signal.SIGABRT, -signal.SIGBUS,
              -signal.SIGILL, -signal.SIGFPE}


def run_file(path: str, tier: str, timeout: float):
    cmd = [sys.executable, "-m", "pytest", path, "-q", "--no-header", "-p",
           "no:cacheprovider"]
    if tier == "quick":
        cmd += ["-m", "not slow"]
    t0 = time.perf_counter()
    try:
        p = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                           timeout=timeout)
        rc, out = p.returncode, p.stdout + p.stderr
    except subprocess.TimeoutExpired as e:
        rc = 124
        out = ((e.stdout or b"").decode(errors="replace")
               + (e.stderr or b"").decode(errors="replace")
               + f"\nTIMEOUT after {timeout:g}s")
    return rc, out, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="full", choices=["quick", "full"])
    ap.add_argument("--timeout", type=float, default=1800.0,
                    help="per-file wall-clock limit (seconds)")
    ap.add_argument("-k", default=None,
                    help="substring filter on test FILE names")
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(ROOT, "tests", "test_*.py")))
    if args.k:
        files = [f for f in files if args.k in os.path.basename(f)]
    if not files:
        print("no test files matched")
        return 2

    failures = []
    t_start = time.perf_counter()
    for path in files:
        name = os.path.basename(path)
        rc, out, dt = run_file(path, args.tier, args.timeout)
        if rc in CRASH_SIGS:
            print(f"{name}: CRASHED (rc={rc}) — retrying once", flush=True)
            rc, out, dt2 = run_file(path, args.tier, args.timeout)
            dt += dt2
        # pytest rc 5 = no tests collected (a fully-deselected quick-tier
        # file) — not a failure
        status = "ok" if rc in (0, 5) else f"FAIL rc={rc}"
        tail = out.strip().splitlines()[-1] if out.strip() else ""
        print(f"{name:36s} {status:12s} {dt:7.1f}s  {tail}", flush=True)
        if rc not in (0, 5):
            failures.append((name, rc, out))

    total = time.perf_counter() - t_start
    print(f"\n{len(files) - len(failures)}/{len(files)} files passed "
          f"in {total / 60:.1f} min ({args.tier} tier)")
    for name, rc, out in failures:
        print(f"\n=== {name} (rc={rc}) ===")
        print("\n".join(out.strip().splitlines()[-25:]))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
