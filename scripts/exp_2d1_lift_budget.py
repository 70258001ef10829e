"""Decompose the Schaefer-Turek 2D-1 lift plateau (docs/STATUS.md section 5).

Loads a settled 2D-1 run state and reports, on the final field:
  - pressure vs viscous lift/drag split at wall_order 1 and 2
  - the second-order PRESSURE wall-closure increment
        p_wall = p_P - d_w (n_hat . grad p)   =>  dF = -sum d_w (n.gp) A_w
  - the wall-link normal-component contribution (the full-vector link
    applies nu L/d to U_n too; the physical traction there is different)

Usage: python scripts/exp_2d1_lift_budget.py <state.ckpt> <delta>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    state_path = sys.argv[1]
    delta = float(sys.argv[2])
    platform = sys.argv[3] if len(sys.argv) > 3 else None
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from tpufoam.eval.benchmark import load_run_state, schafer_turek_case
    from tpufoam.fv.forces import obstacle_force
    from tpufoam.fv.momentum import wall_shear2_source, wall_unit_normal
    from tpufoam.fv.pressure import pressure_gradient

    case, u_mean = schafer_turek_case("2D-1", delta=delta)
    flow, _ = load_run_state(state_path)
    q = 0.5 * u_mean**2 * 0.1

    r1 = obstacle_force(case, flow.u, flow.v, flow.p, u_ref=u_mean,
                        d_ref=0.1, wall_order=1)
    r2 = obstacle_force(case, flow.u, flow.v, flow.p, u_ref=u_mean,
                        d_ref=0.1, wall_order=2)
    print(f"wall_order=1: cd={float(r1.cd):.5f} cl={float(r1.cl):+.5f}")
    print(f"  pressure  f=({float(r1.f_pressure[0]):+.3e},"
          f" {float(r1.f_pressure[1]):+.3e})"
          f"  -> cd_p={float(r1.f_pressure[0]) / q:+.5f}"
          f" cl_p={float(r1.f_pressure[1]) / q:+.5f}")
    print(f"  viscous   f=({float(r1.f_viscous[0]):+.3e},"
          f" {float(r1.f_viscous[1]):+.3e})"
          f"  -> cd_v={float(r1.f_viscous[0]) / q:+.5f}"
          f" cl_v={float(r1.f_viscous[1]) / q:+.5f}")
    print(f"wall_order=2: cd={float(r2.cd):.5f} cl={float(r2.cl):+.5f}")

    gpx, gpy = pressure_gradient(case, flow.p)
    ax, ay = case.wall_ax, case.wall_ay
    # n_hat into the SOLID is +A/|A|; centroid sits d_w into the fluid,
    # so p_wall = p_P + d_w * (n_solid . grad p)|_P to first order
    nx_, ny_ = wall_unit_normal(case)
    dpdn = nx_ * gpx + ny_ * gpy
    dfx = float(jnp.sum(case.wall_dist * dpdn * ax))
    dfy = float(jnp.sum(case.wall_dist * dpdn * ay))
    print(f"2nd-order pressure closure increment: "
          f"dcd_p={dfx / q:+.5f} dcl_p={dfy / q:+.5f}")

    # normal vs tangential wall-link split: a_wall U = a_wall (U_t t + U_n n)
    wall_len = case.wall_len
    a_wall = case.nu * wall_len / case.wall_dist
    tx, ty = -ny_, nx_
    ut = flow.u * tx + flow.v * ty
    un = flow.u * nx_ + flow.v * ny_
    fn_x = float(jnp.sum(a_wall * un * nx_))
    fn_y = float(jnp.sum(a_wall * un * ny_))
    ft_x = float(jnp.sum(a_wall * ut * tx))
    ft_y = float(jnp.sum(a_wall * ut * ty))
    print(f"wall-link tangential part: cd={ft_x / q:+.5f} cl={ft_y / q:+.5f}")
    print(f"wall-link normal    part: cd={fn_x / q:+.5f} cl={fn_y / q:+.5f}")

    ws_u, ws_v = wall_shear2_source(case, gpx, gpy)
    print(f"shear2 correction: dcd={-float(jnp.sum(ws_u)) / q:+.5f} "
          f"dcl={-float(jnp.sum(ws_v)) / q:+.5f}")


if __name__ == "__main__":
    main()
