"""Obstacle force and force-coefficient diagnostics.

The reference computes lift/drag through OpenFOAM's forceCoeffs function
object every 0.01 s (parallelized/test_case/system/controlDict:61-107).
Here the force on the blanked obstacle is assembled from its wall faces:
pressure acts along the face normal (zero-gradient wall => face pressure =
adjacent cell pressure), and wall shear is nu * U_t / (d/2) with the
half-cell wall distance. Kinematic units (per density), per unit depth.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from .case import Case


@flax.struct.dataclass
class ForceReport:
    f_pressure: jnp.ndarray  # (2,) [Fx, Fy]
    f_viscous: jnp.ndarray   # (2,)
    cd: jnp.ndarray          # drag coefficient
    cl: jnp.ndarray          # lift coefficient

    @property
    def total(self):
        return self.f_pressure + self.f_viscous


def _obstacle_walls(case: Case):
    """Wall-face masks excluding the domain top/bottom boundaries."""
    interior_n = jnp.ones_like(case.fluid).at[-1, :].set(0.0)
    interior_s = jnp.ones_like(case.fluid).at[0, :].set(0.0)
    return (case.wall_e, case.wall_w,
            case.wall_n * interior_n, case.wall_s * interior_s)


@jax.jit
def obstacle_force(case: Case, u: jnp.ndarray, v: jnp.ndarray,
                   p: jnp.ndarray, u_ref: float = 1.0,
                   d_ref: float = 1.0) -> ForceReport:
    """Integrate pressure + viscous force over the obstacle surface.

    u_ref/d_ref: reference velocity and length for the coefficients
    (the reference uses magUInf/lRef in its forceCoeffs dict)."""
    grid = case.grid
    dx, dy, nu = grid.dx, grid.dy, case.nu
    w_e, w_w, w_n, w_s = _obstacle_walls(case)

    # pressure force on the body: +p along the fluid->solid direction
    fpx = jnp.sum(p * w_e * dy) - jnp.sum(p * w_w * dy)
    fpy = jnp.sum(p * w_n * dx) - jnp.sum(p * w_s * dx)

    # wall shear: tangential velocity gradient over the half cell
    # x-normal walls (east/west): tangential component is v
    fvy = nu * (jnp.sum(v * w_e * dy) + jnp.sum(v * w_w * dy)) / (dx / 2)
    # y-normal walls: tangential component is u
    fvx = nu * (jnp.sum(u * w_n * dx) + jnp.sum(u * w_s * dx)) / (dy / 2)
    # shear on the body opposes the shear on the fluid
    f_visc = jnp.stack([fvx, fvy])

    f_pres = jnp.stack([fpx, fpy])
    q = 0.5 * u_ref**2 * d_ref
    total = f_pres + f_visc
    return ForceReport(f_pressure=f_pres, f_viscous=f_visc,
                       cd=total[0] / q, cl=total[1] / q)
