"""End-of-round artifact hygiene (VERDICT r4 #8).

Rounds 3 and 4 both ended with untracked queue output sitting in
`artifacts/` — benign both times, but only because test globs filtered it.
This script ELIMINATES the failure mode at the source: run it as the last
queue job (and before ending a round) to classify every untracked file
under artifacts/:

  clean JSON artifact          -> `git add` (+ optional commit)
  diverged-but-unprefixed JSON -> rename to `unstable_*` (the writer-side
                                  quarantine convention), then add
  anything unclassifiable      -> FAIL LOUDLY (exit 1, listed) — a human
                                  decides; nothing silently drops into a
                                  test glob or silently vanishes

Usage:
    python scripts/snapshot_artifacts.py            # classify + stage
    python scripts/snapshot_artifacts.py --commit   # ... and commit
    python scripts/snapshot_artifacts.py --dry-run  # report only
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

# force-series keys the writer-side quarantine checks
# (scripts/validate_schafer_turek.py): any non-finite or absurd value
# marks the run diverged
_FORCE_KEYS = ("cd", "cl", "cd_max", "cl_max", "dp_final")

# non-JSON untracked content that is legitimate to stage as-is
_KNOWN_SUFFIXES = (".md", ".txt", ".csv", ".log")


def _git(*args) -> str:
    return subprocess.run(["git", "-C", REPO, *args], check=True,
                          capture_output=True, text=True).stdout


def _untracked_artifacts() -> list[str]:
    out = _git("status", "--porcelain", "--", "artifacts")
    files = []
    for line in out.splitlines():
        if line.startswith("??"):
            p = line[3:].strip()
            if p.endswith("/"):
                # untracked directory: expand
                for root, _, names in os.walk(os.path.join(REPO, p)):
                    for n in names:
                        files.append(os.path.relpath(
                            os.path.join(root, n), REPO))
            else:
                files.append(p)
    return files


def classify(path: str) -> tuple[str, str]:
    """-> (verdict, detail). verdict in {clean, diverged, unknown}."""
    full = os.path.join(REPO, path)
    base = os.path.basename(path)
    if base.startswith("unstable_"):
        return "clean", "already quarantined (unstable_ prefix)"
    if path.endswith(".json"):
        try:
            with open(full) as f:
                data = json.load(f)
        except Exception as e:
            return "unknown", f"unparseable JSON: {e}"
        if isinstance(data, dict):
            vals = [data.get(k) for k in _FORCE_KEYS if k in data]
            bad = [v for v in vals
                   if not isinstance(v, (int, float))
                   or not math.isfinite(v) or abs(v) > 50.0]
            if bad:
                return "diverged", f"force keys out of range: {bad}"
            if data.get("diverged"):
                return "diverged", "self-reported diverged flag"
        return "clean", "parseable JSON, force keys in range"
    if path.endswith(_KNOWN_SUFFIXES):
        return "clean", "known text format"
    return "unknown", "unrecognized file type for artifacts/"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commit", action="store_true",
                    help="commit the staged snapshot")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--message", default="Artifact snapshot (queue output)")
    args = ap.parse_args()

    files = _untracked_artifacts()
    if not files:
        print("artifact tree clean: no untracked files under artifacts/")
        return 0

    unknown = []
    staged = []
    for path in sorted(files):
        verdict, detail = classify(path)
        print(f"{verdict:8s} {path}  [{detail}]")
        if verdict == "unknown":
            unknown.append(path)
            continue
        final = path
        if verdict == "diverged":
            d, b = os.path.split(path)
            final = os.path.join(d, "unstable_" + b)
            if not args.dry_run:
                os.replace(os.path.join(REPO, path),
                           os.path.join(REPO, final))
            print(f"         -> quarantined as {final}")
        if not args.dry_run:
            _git("add", "--", final)
        staged.append(final)

    if unknown:
        print(f"\nFAIL: {len(unknown)} unclassifiable artifact(s) — "
              "resolve by hand (commit, quarantine, or delete):")
        for p in unknown:
            print(f"  {p}")
        return 1

    if staged and args.commit and not args.dry_run:
        _git("commit", "-m", args.message)
        print(f"\ncommitted {len(staged)} artifact(s)")
    elif staged and not args.dry_run:
        print(f"\nstaged {len(staged)} artifact(s) (pass --commit to commit)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
