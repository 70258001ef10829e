"""Feature/target definitions of the five surrogate-model families.

Each reference variant is a feature configuration over the same patch
pipeline (SURVEY.md §2.1):

  deltaU_deltaP : [dUx/Um, dUy/Um, SDF] -> dp/Um^2   (per-block zero-mean)
                  source/pressureSM_deltas/train.py:217-230
  poisson       : [arcsinh-smoothed Poisson source, dUx/Um, dUy/Um, SDF]
                  -> dp/Um^2; source term (Ux,x^2 + 2 Ux,y Uy,x + Uy,y^2)
                  * L^2/Um^2, pressureSM_Poisson/train.py:557-584
  M_u           : [Ux/Um, Uy/Um, SDF] -> p/Um^2
                  Chapter4/MLP/M_u/DataGen+Training/train.py:303-345
  M_fU          : [f_U/Um^2, SDF] -> p/Um^2 with
                  f_U = Ux,x^2 + Uy,y^2 + 2 Ux,y Uy,x
                  Chapter4/MLP/M_fU/train.py:314-344
  U_gradP       : [Ux/Um, Uy/Um, SDF] -> [dp/dx*Lx/Um^2, dp/dy*Ly/Um^2]
                  Improved_SM/U_to_gradP/training/train.py:312-357

All builders are pure jnp functions (ny, nx) -> (ny, nx, C); the
nondimensionalization by the instantaneous max |U| (python_module.py:270-273)
happens here, max-abs dataset scaling lives in the artifact bundle.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from ..fv.case import Case


def u_max_norm(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(jnp.max(jnp.sqrt(u * u + v * v)), 1e-12)


def masked_gradient(case: Case, f: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """np.gradient-style central differences (index spacing 1), zeroed on
    solid cells and their direct fluid neighbours — the behaviour of the
    reference's `gradient_with_nan_direct_neighbors`
    (pressureSM_Poisson/train.py:532-551)."""
    gy, gx = jnp.gradient(f)
    near_wall = (case.wall_e + case.wall_w + case.wall_n + case.wall_s) > 0
    keep = case.fluid * (1.0 - near_wall)
    return gy * keep, gx * keep


def smart_arcsinh(field: jnp.ndarray, k: float) -> jnp.ndarray:
    """Outlier-taming transform (pressureSM_Poisson/train.py:63-110): map
    [mean - k*std, mean + k*std] affinely to [-1, 1], push outliers beyond,
    then arcsinh.

    Outlier branches divide by |bound|, not the signed bound the
    reference uses: with the usual lb < 0 < ub (zero-centred source
    fields) the two are algebraically IDENTICAL, but the signed form
    inverts the mapping (low outliers land ABOVE +1, non-monotonic)
    whenever the whole central band sits on one side of zero
    (lb > 0 or ub < 0)."""
    mean = jnp.mean(field)
    std = jnp.std(field)
    lb = mean - k * std
    ub = mean + k * std

    def _safe_abs(b):
        a = jnp.abs(b)
        return jnp.where(a < 1e-30, 1.0, a)

    scaled = jnp.where(
        field < lb, -1.0 + (field - lb) / _safe_abs(lb),
        jnp.where(field > ub, 1.0 + (field - ub) / _safe_abs(ub),
                  2.0 * (field - lb) / jnp.maximum(ub - lb, 1e-30) - 1.0))
    return jnp.arcsinh(scaled)


def poisson_source(case: Case, u: jnp.ndarray, v: jnp.ndarray,
                   u_max: jnp.ndarray, length_scale: float,
                   k_smooth: float = 2.0) -> jnp.ndarray:
    """(Ux,x^2 + 2 Ux,y Uy,x + Uy,y^2) * L^2/U^2, arcsinh-smoothed
    (pressureSM_Poisson/train.py:557-584). Grid-index gradients like the
    reference (np.gradient without spacing)."""
    du_dy, du_dx = masked_gradient(case, u)
    dv_dy, dv_dx = masked_gradient(case, v)
    term = (du_dx * du_dx + 2.0 * du_dy * dv_dx + dv_dy * dv_dy)
    term = term * (length_scale**2) / (u_max**2)
    return smart_arcsinh(term, k_smooth)


def f_u_term(case: Case, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """f(U) = Ux,x^2 + Uy,y^2 + 2 Ux,y Uy,x — the quantity the reference
    computes inside OpenFOAM and exports (commented C++ at
    Chapter5/.../UEqn.H:27-36). Physical-space derivatives."""
    du_dy, du_dx = masked_gradient(case, u)
    dv_dy, dv_dx = masked_gradient(case, v)
    du_dx = du_dx / case.grid.dx
    dv_dx = dv_dx / case.grid.dx
    du_dy = du_dy / case.grid.dy
    dv_dy = dv_dy / case.grid.dy
    return du_dx * du_dx + dv_dy * dv_dy + 2.0 * du_dy * dv_dx


@dataclasses.dataclass(frozen=True)
class FamilyConfig:
    name: str
    n_in: int
    n_out: int
    target_zero_mean: bool        # subtract per-block masked mean of target
    predicts_delta: bool          # p_new = p_prev + prediction
    build_inputs: Callable        # (case, fields) -> (ny, nx, n_in)
    build_targets: Callable       # (case, fields) -> (ny, nx, n_out)


def _fields_delta(fields):
    du = fields["u"] - fields["u_prev"]
    dv = fields["v"] - fields["v_prev"]
    dp = fields["p"] - fields["p_prev"]
    return du, dv, dp


def _in_deltas(case, fields):
    du, dv, _ = _fields_delta(fields)
    um = u_max_norm(fields["u"], fields["v"])
    return jnp.stack([du / um, dv / um, case.sdf], axis=-1)


def _out_deltas(case, fields):
    _, _, dp = _fields_delta(fields)
    um = u_max_norm(fields["u"], fields["v"])
    return (dp / um**2)[..., None]


def _in_poisson(case, fields):
    du, dv, _ = _fields_delta(fields)
    um = u_max_norm(fields["u"], fields["v"])
    length = fields.get("length_scale", 1.0)
    src = poisson_source(case, fields["u"], fields["v"], um, length,
                         fields.get("k_smooth", 2.0))
    return jnp.stack([src, du / um, dv / um, case.sdf], axis=-1)


def _in_mu(case, fields):
    um = u_max_norm(fields["u"], fields["v"])
    return jnp.stack([fields["u"] / um, fields["v"] / um, case.sdf], axis=-1)


def _out_p(case, fields):
    um = u_max_norm(fields["u"], fields["v"])
    return (fields["p"] / um**2)[..., None]


def _in_mfu(case, fields):
    um = u_max_norm(fields["u"], fields["v"])
    f_u = f_u_term(case, fields["u"], fields["v"]) / um**2
    return jnp.stack([f_u, case.sdf], axis=-1)


def _out_gradp(case, fields):
    um = u_max_norm(fields["u"], fields["v"])
    gy, gx = jnp.gradient(fields["p"])
    gx = gx / case.grid.dx * case.fluid
    gy = gy / case.grid.dy * case.fluid
    lx = case.grid.nx * case.grid.dx
    ly = case.grid.ny * case.grid.dy
    return jnp.stack([gx * lx / um**2, gy * ly / um**2], axis=-1)


FAMILIES = {
    "deltaU_deltaP": FamilyConfig("deltaU_deltaP", 3, 1, True, True,
                                  _in_deltas, _out_deltas),
    "poisson": FamilyConfig("poisson", 4, 1, True, True,
                            _in_poisson, _out_deltas),
    "M_u": FamilyConfig("M_u", 3, 1, True, False, _in_mu, _out_p),
    "M_fU": FamilyConfig("M_fU", 2, 1, True, False, _in_mfu, _out_p),
    "U_gradP": FamilyConfig("U_gradP", 3, 2, False, False,
                            _in_mu, _out_gradp),
}
