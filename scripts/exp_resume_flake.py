"""Reproduce/corner the checkpoint-resume bitwise flake (VERDICT r4 #7).

test_force_series_checkpoint_resume_is_exact failed ONCE inside a 39-min
full suite run (r4) and passed on every isolated rerun. Hypothesis:
compile-cache-pressure recompilation changing XLA CPU fusion choices
mid-file. Supporting evidence from r5: embedding the same bf16 mg_solve
in a different surrounding program changes results by ~1e-5/10 steps
(tests/test_auto_backend.py rollout test) — fusion choices DO move the
bits. The open question is whether a RE-compile of the IDENTICAL program
can differ from the first compile.

This harness runs the straight-vs-resumed comparison N times, each time
injecting one of the suspected triggers between the resume halves:
    none      — control
    clear     — jax.clear_caches() (forces full retrace + recompile)
    pollute   — compile K unrelated differently-shaped programs first
                (cache pressure / eviction)
    threads   — run under a busy CPU (spawn a spin thread during the
                resumed half)
Reports any bitwise mismatch with its trigger and max |diff|.
"""

from __future__ import annotations

import argparse
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10, help="repetitions per trigger")
    ap.add_argument("--out", default="artifacts/resume_flake_probe.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tpufoam.eval.benchmark import (load_run_state, run_force_series,
                                        save_run_state, schafer_turek_case)
    from tpufoam.fv.case import initial_flow
    from tpufoam.piso.engine import PisoConfig
    from tpufoam.solvers.backends import MGBackend

    case, u_mean = schafer_turek_case("2D-2", delta=0.41 / 24)
    cfg = PisoConfig(max_co=0.4, max_dt=5e-3)
    be = MGBackend(cycles=2)

    def series(flow, t_end):
        return run_force_series(case, flow, t_end, u_ref=u_mean, cfg=cfg,
                                backend=be, sample_steps=5)

    def pollute():
        for k in range(6):
            n = 96 + 16 * k
            x = jnp.ones((n, n))
            jax.jit(lambda a: (a @ a.T + jnp.sin(a)).sum())(x).block_until_ready()

    stop_spin = threading.Event()

    def spin():
        x = 1.0
        while not stop_spin.is_set():
            x = x * 1.0000001 + 1e-9

    flow_a, ser_a = series(initial_flow(case, dt0=1e-3), 0.04)
    ua, pa = np.asarray(flow_a.u), np.asarray(flow_a.p)

    results = {}
    mismatches = []
    for trigger in ("none", "clear", "pollute", "threads"):
        bad = 0
        for rep in range(args.n):
            flow_h, ser_h = series(initial_flow(case, dt0=1e-3), 0.02)
            path = f"/tmp/flake_state_{trigger}_{rep}.npz"
            save_run_state(path, flow_h, ser_h)
            th = None
            if trigger == "clear":
                jax.clear_caches()
            elif trigger == "pollute":
                jax.clear_caches()
                pollute()
            elif trigger == "threads":
                stop_spin.clear()
                th = [threading.Thread(target=spin, daemon=True)
                      for _ in range(4)]
                for t in th:
                    t.start()
            flow_r, _ = series(load_run_state(path)[0], 0.04)
            if th:
                stop_spin.set()
            ur, pr = np.asarray(flow_r.u), np.asarray(flow_r.p)
            if not (np.array_equal(ua, ur) and np.array_equal(pa, pr)):
                bad += 1
                mismatches.append(dict(
                    trigger=trigger, rep=rep,
                    max_du=float(np.abs(ua - ur).max()),
                    max_dp=float(np.abs(pa - pr).max())))
                print(f"  MISMATCH trigger={trigger} rep={rep} "
                      f"du={np.abs(ua - ur).max():.3e}")
            os.unlink(path)
        results[trigger] = dict(reps=args.n, mismatches=bad)
        print(f"{trigger}: {bad}/{args.n} mismatched")

    import json
    out = dict(results=results, mismatches=mismatches,
               note="straight-vs-resumed bitwise comparison under induced "
                    "recompile/cache-pressure/thread-load triggers")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
