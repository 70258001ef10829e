"""Diagnose the cut-cell force path on Schaefer-Turek 2D-1 (Re=20 steady).

Computes the drag three ways on the converged state:
  probe    — fv.forces._obstacle_force_cut (production path)
  discrete — the momentum-consistent wall terms: F_p = sum p_P A_w,
             F_nu = sum nu (L_w / d_w) U_t  (exactly what the discretized
             momentum equation takes out of the fluid)
  probe-s  — probe force with a larger standoff (sensitivity check)

If probe != discrete, the force EVALUATION is biased; if both agree but
miss the published band, the DISCRETIZATION (wall links) is biased.
"""

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def discrete_force(case, u, v, p, nu_t=None):
    import jax.numpy as jnp
    wall_len = jnp.sqrt(case.wall_ax**2 + case.wall_ay**2)
    fpx = float(jnp.sum(p * case.wall_ax))
    fpy = float(jnp.sum(p * case.wall_ay))
    a_wall = case.nu * wall_len / case.wall_dist
    fvx = float(jnp.sum(a_wall * u))
    fvy = float(jnp.sum(a_wall * v))
    return (fpx, fvx), (fpy, fvy)


def cv_drag(case, u, v, p, box):
    """Control-volume momentum-balance drag (kinematic, unit depth):
        F_x = - d/dt(...) + sum_faces [-(u)(U.n) - p n_x + nu dU_x/dn]
    evaluated on a grid-aligned rectangle strictly inside the fluid —
    independent of ANY wall treatment (the arbiter between the probe and
    the discrete wall forces). Steady flows only."""
    import numpy as np
    g = case.grid
    u = np.asarray(u); v = np.asarray(v); p = np.asarray(p)
    nu = case.nu
    dx, dy = g.dx, g.dy
    j1 = int((box[0] - g.x0) / dx)
    j2 = int((box[1] - g.x0) / dx)
    i1 = int((box[2] - g.y0) / dy)
    i2 = int((box[3] - g.y0) / dy)

    def ddx(f, j):   # central d/dx at column j
        return (f[:, j + 1] - f[:, j - 1]) / (2 * dx)

    def ddy(f, i):
        return (f[i + 1, :] - f[i - 1, :]) / (2 * dy)

    # west (n=-x): +(p + u^2 - 2 nu du/dx)
    w = (p[i1:i2, j1] + u[i1:i2, j1] ** 2
         - 2 * nu * ddx(u, j1)[i1:i2]).sum() * dy
    e = (p[i1:i2, j2] + u[i1:i2, j2] ** 2
         - 2 * nu * ddx(u, j2)[i1:i2]).sum() * dy
    # south (n=-y): +(u v - nu (du/dy + dv/dx))
    s = (u[i1, j1:j2] * v[i1, j1:j2]
         - nu * (ddy(u, i1)[j1:j2]
                 + (v[i1, j1 + 1:j2 + 1] - v[i1, j1 - 1:j2 - 1])
                 / (2 * dx))).sum() * dx
    n = (u[i2, j1:j2] * v[i2, j1:j2]
         - nu * (ddy(u, i2)[j1:j2]
                 + (v[i2, j1 + 1:j2 + 1] - v[i2, j1 - 1:j2 - 1])
                 / (2 * dx))).sum() * dx
    return (w - e) + (s - n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--delta", type=float, default=0.41 / 96)
    ap.add_argument("--t-end", type=float, default=16.0)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tpufoam.eval.benchmark import schafer_turek_case
    from tpufoam.fv.case import initial_flow
    from tpufoam.fv import forces as F
    from tpufoam.piso.engine import PisoConfig, run_piso_chunked
    from tpufoam.solvers.backends import MGCGBackend

    case, u_mean = schafer_turek_case("2D-1", delta=args.delta)
    print(f"grid {case.grid.ny}x{case.grid.nx} D/delta={0.1/args.delta:.1f}",
          flush=True)
    flow = initial_flow(case, dt0=1e-3)
    cfg = PisoConfig(max_co=0.5, max_dt=2e-2)
    be = MGCGBackend(rtol=1e-6)
    t0 = time.time()
    while float(flow.t) < args.t_end:
        flow = run_piso_chunked(case, flow, 200, cfg=cfg, backend=be,
                                chunk=10)
        print(f"t={float(flow.t):.2f} [{time.time()-t0:.0f}s]", flush=True)

    q = 0.5 * u_mean**2 * 0.1
    rep = F.obstacle_force(case, flow.u, flow.v, flow.p, u_ref=u_mean,
                           d_ref=0.1)
    print(f"probe:    cd={float(rep.cd):.4f} "
          f"(p {float(rep.f_pressure[0])/q:.4f} "
          f"nu {float(rep.f_viscous[0])/q:.4f}) cl={float(rep.cl):+.5f}")
    (fpx, fvx), (fpy, fvy) = discrete_force(case, flow.u, flow.v, flow.p)
    print(f"discrete: cd={(fpx+fvx)/q:.4f} (p {fpx/q:.4f} nu {fvx/q:.4f}) "
          f"cl={(fpy+fvy)/q:+.5f}")
    for box in ((0.08, 0.36, 0.06, 0.36), (0.05, 0.60, 0.03, 0.39)):
        fx = cv_drag(case, flow.u, flow.v, flow.p, box)
        print(f"cv {box}: cd={fx/q:.4f}")
    print("published cd [5.57, 5.59], cl [0.0104, 0.0110]")


if __name__ == "__main__":
    main()
