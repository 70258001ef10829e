"""Device-resident case state: static masks + dynamic flow fields.

`Case` is everything fixed for a given geometry: fluid/solid blanking,
per-direction boundary masks, the SDF feature grid and the inlet profile.
`Flow` is the dynamic pytree advanced by the PISO engine (the reference
keeps these inside OpenFOAM's objectRegistry, createFields.H; here they are
plain JAX arrays so jit/vmap/pjit compose).

Boundary model (matches the reference benchmark case
Thesis_Work/Chapter5/parallelized/test_case):
  west  = inlet  (fixed parabolic U, zero-grad p)      0/U:26-45
  east  = outlet (zero-grad U, fixed p = 0)            0/p
  north/south + obstacle = no-slip walls, zero-grad p
Obstacle cells are blanked (fluid mask = 0) — the TPU-friendly equivalent
of the reference's body-fitted O-grid blocks.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from ..core.geometry import ChannelCase
from ..core.grid import Grid2D, make_grid
from ..core.sdf import domain_and_sdf


@flax.struct.dataclass
class Case:
    # --- static metadata (hashable; not traced) ---
    grid: Grid2D = flax.struct.field(pytree_node=False)
    nu: float = flax.struct.field(pytree_node=False)
    # --- device arrays ---
    fluid: jnp.ndarray          # (ny, nx) 1.0 fluid / 0.0 solid
    sdf: jnp.ndarray            # (ny, nx) wall distance, 0 in solids
    inlet_u: jnp.ndarray        # (ny,) inlet x-velocity profile
    # per-direction face apertures (fraction of the face open to the
    # neighbour; {0,1} in blanked mode, [0,1] in cut-cell mode; 0 at
    # domain edges). See fv.cutcell.
    open_e: jnp.ndarray
    open_w: jnp.ndarray
    open_n: jnp.ndarray
    open_s: jnp.ndarray
    # boundary-face masks per cell (stair-step faces toward non-fluid cells;
    # used by the SST wall terms and blank-mode force sampling)
    wall_e: jnp.ndarray
    wall_w: jnp.ndarray
    wall_n: jnp.ndarray
    wall_s: jnp.ndarray
    inlet_w: jnp.ndarray        # (ny, nx) 1 on fluid cells whose west face is the inlet
    outlet_e: jnp.ndarray       # (ny, nx) 1 on fluid cells whose east face is the outlet
    # --- cut-cell geometry (fv.cutcell; binary-consistent in blank mode) ---
    alpha: jnp.ndarray          # (ny, nx) fluid volume fraction
    wall_ax: jnp.ndarray        # embedded-wall area vector (outward into the
    wall_ay: jnp.ndarray        #   solid); reduces to stair faces when binary
    wall_len: jnp.ndarray       # embedded-wall wetted length (friction area;
                                #   >= |(wall_ax, wall_ay)| — opposing stair
                                #   faces add here but cancel in the vector)
    wall_dist: jnp.ndarray      # centroid->wall distance (1.0 where no wall)
    cut: bool = flax.struct.field(pytree_node=False, default=False)



class GridMetrics:
    """Broadcastable FV metric terms for uniform AND stretched grids.

    On uniform grids every field is the SAME Python float the legacy
    expressions used (dy/dx conductances, 0.5 face weights), so the traced
    programs — and their results — are bitwise identical to the validated
    round-2..4 scheme. On stretched tensor-product grids (Grid2D.xs/ys)
    they become (1, nx)/(ny, 1) float32 constants: cell spacings, per-
    direction centre-to-centre distances, and distance-weighted face
    interpolation weights (the weight OF THE CELL at its own face). All
    downstream use is broadcasting into existing fused elementwise
    graphs — no gathers, no stride tricks (docs/STATUS.md §2 invariants).
    """

    __slots__ = ("dxc", "dyc", "hx_e", "hx_w", "hy_n", "hy_s",
                 "wx_e", "wx_w", "wy_n", "wy_s", "stretched")

    def __init__(self, grid: Grid2D):
        self.stretched = grid.stretched
        if not grid.stretched:
            self.dxc, self.dyc = grid.dx, grid.dy
            self.hx_e = self.hx_w = grid.dx
            self.hy_n = self.hy_s = grid.dy
            self.wx_e = self.wx_w = self.wy_n = self.wy_s = 0.5
            return
        xs, ys = grid.spacing_arrays(np)

        def row(v):
            return jnp.asarray(v.astype(np.float32))[None, :]

        def col(v):
            return jnp.asarray(v.astype(np.float32))[:, None]

        self.dxc, self.dyc = row(xs), col(ys)
        # centre-to-centre distances toward each neighbour; the domain-edge
        # entries (no neighbour) carry the own-cell spacing — their faces
        # are always closed (open_* = 0) or handled by dedicated boundary
        # closures (inlet/outlet half-distance uses dxc directly)
        self.hx_e = row(0.5 * (xs + np.append(xs[1:], xs[-1])))
        self.hx_w = row(0.5 * (xs + np.concatenate([xs[:1], xs[:-1]])))
        self.hy_n = col(0.5 * (ys + np.append(ys[1:], ys[-1])))
        self.hy_s = col(0.5 * (ys + np.concatenate([ys[:1], ys[:-1]])))
        # linear face interpolation: value at the cell's east face =
        # wx_e * f_P + (1 - wx_e) * f_E with wx_e = dx_E / (dx_P + dx_E)
        # (the face sits half of each cell away from either centre)
        xe = np.append(xs[1:], xs[-1])
        xw = np.concatenate([xs[:1], xs[:-1]])
        yn = np.append(ys[1:], ys[-1])
        yso = np.concatenate([ys[:1], ys[:-1]])
        self.wx_e = row(xe / (xs + xe))
        self.wx_w = row(xw / (xs + xw))
        self.wy_n = col(yn / (ys + yn))
        self.wy_s = col(yso / (ys + yso))


def grid_metrics(grid: Grid2D) -> GridMetrics:
    """Metric terms for the FV discretization (see GridMetrics). Called at
    trace time inside jitted steps — the arrays are small constants."""
    return GridMetrics(grid)


def domain_row_masks(case: "Case"):
    """(dom_n, dom_s): fluid cells in the top/bottom DOMAIN wall rows.
    One implementation for the momentum / pressure / SST wall links,
    which all apply half-cell channel-wall closures on these rows."""
    dom_n = jnp.zeros_like(case.fluid).at[-1, :].set(1.0) * case.fluid
    dom_s = jnp.zeros_like(case.fluid).at[0, :].set(1.0) * case.fluid
    return dom_n, dom_s


@flax.struct.dataclass
class Flow:
    u: jnp.ndarray       # (ny, nx)
    v: jnp.ndarray       # (ny, nx)
    p: jnp.ndarray       # (ny, nx) kinematic pressure [m^2/s^2]
    phi_x: jnp.ndarray   # (ny, nx+1) volumetric face fluxes [m^2/s] (unit depth)
    phi_y: jnp.ndarray   # (ny+1, nx)
    dt: jnp.ndarray      # () current time step
    t: jnp.ndarray       # () current time
    # previous-step fields: the delta-featured surrogate families consume
    # dU = U - U_prev, dp = p - p_prev (SM_call.py:389-394)
    u_prev: jnp.ndarray
    v_prev: jnp.ndarray
    p_prev: jnp.ndarray


def build_channel_case(geom: ChannelCase, delta: float = None,
                       n_boundary: int = 720,
                       boundary: str = "cutcell",
                       alpha_cut: float = 0.05,
                       grid: Grid2D = None) -> Case:
    """Discretize a ChannelCase onto a uniform grid (one-time host setup).

    boundary: 'cutcell' resolves the obstacle with sub-cell face apertures
    and volume fractions (fv.cutcell; the fix for the stair-step force
    bias); 'blank' is the round-2 binary centre-inside mask. Both run
    through the same generalized discretization — blank mode is the
    binary-aperture limit.

    grid: pass a prebuilt Grid2D (e.g. a stretched make_graded_grid that
    packs cells around the obstacle — the reference's simpleGrading
    counterpart) instead of the uniform `delta` spacing.
    """
    from .cutcell import cut_masks

    if grid is None:
        if delta is None:
            raise ValueError("pass either delta (uniform) or grid")
        grid = make_grid(0.0, geom.length, 0.0, geom.height, delta)
    pts = grid.cell_centers_flat(np)

    top_b = geom.boundary_points_top(4 * n_boundary)
    if geom.shape is None:
        # empty channel (e.g. Poiseuille validation case)
        inside = np.zeros(grid.shape, dtype=bool)
        obst_b = np.full((4, 2), 1e6, dtype=np.float64)  # no obstacle
    else:
        inside = geom.shape.inside(pts).reshape(grid.shape)
        obst_b = geom.shape.boundary_points(n_boundary)

    cg = cut_masks(grid, geom.shape, inside, mode=boundary,
                   alpha_cut=alpha_cut)
    fluid_np = cg["fluid"].astype(np.float32)

    _, sdf = domain_and_sdf(pts, top_b, obst_b,
                            obst_inside=inside.reshape(-1))
    sdf = jnp.asarray(sdf).reshape(grid.shape) * fluid_np

    if not grid.stretched:
        y = grid.y0 + (np.arange(grid.ny) + 0.5) * grid.dy
    else:
        ye = grid.y_edges(np)
        y = 0.5 * (ye[:-1] + ye[1:])
    inlet_u = geom.inlet_profile(y).astype(np.float32)

    _validate_connectivity(fluid_np)
    return _assemble_masks(grid, fluid_np, np.asarray(sdf), inlet_u, geom.nu,
                           cg, cut=(boundary == "cutcell"))


def _validate_connectivity(fluid: np.ndarray) -> None:
    """Reject ill-posed cases where the obstacle seals the channel: a fixed
    inflow with no path to the outlet has no solution (pressure blows up —
    the reference would NaN the same way, python_module.py's only guard is
    a NaN fallback at :494-496; we fail fast at setup instead)."""
    from scipy import ndimage
    labels, _ = ndimage.label(fluid > 0)
    inlet_labels = set(np.unique(labels[:, 0])) - {0}
    outlet_labels = set(np.unique(labels[:, -1])) - {0}
    if not (inlet_labels & outlet_labels):
        raise ValueError(
            "ill-posed case: no fluid path connects the inlet to the outlet "
            "(obstacle seals the channel)")


def _assemble_masks(grid: Grid2D, fluid: np.ndarray, sdf: np.ndarray,
                    inlet_u: np.ndarray, nu: float, cg: dict,
                    cut: bool = False) -> Case:
    ny, nx = fluid.shape
    f = fluid

    nbf_e = np.zeros_like(f); nbf_e[:, :-1] = f[:, 1:]
    nbf_w = np.zeros_like(f); nbf_w[:, 1:] = f[:, :-1]
    nbf_n = np.zeros_like(f); nbf_n[:-1, :] = f[1:, :]
    nbf_s = np.zeros_like(f); nbf_s[1:, :] = f[:-1, :]

    interior_e = np.ones_like(f); interior_e[:, -1] = 0
    interior_w = np.ones_like(f); interior_w[:, 0] = 0
    interior_n = np.ones_like(f); interior_n[-1, :] = 0
    interior_s = np.ones_like(f); interior_s[0, :] = 0

    # fractional face apertures from fv.cutcell ({0,1} in blank mode)
    thx = cg["thx"].astype(np.float32)
    thy = cg["thy"].astype(np.float32)
    open_e = thx[:, 1:] * interior_e
    open_w = thx[:, :-1] * interior_w
    open_n = thy[1:, :] * interior_n
    open_s = thy[:-1, :] * interior_s

    # walls: obstacle faces (interior face to a solid cell) + domain N/S walls
    wall_e = f * interior_e * (1 - nbf_e)
    wall_w = f * interior_w * (1 - nbf_w)
    wall_n = f * ((interior_n * (1 - nbf_n)) + (1 - interior_n))
    wall_s = f * ((interior_s * (1 - nbf_s)) + (1 - interior_s))
    wall_n = np.minimum(wall_n, 1.0)
    wall_s = np.minimum(wall_s, 1.0)

    inlet_w = np.zeros_like(f); inlet_w[:, 0] = f[:, 0]
    outlet_e = np.zeros_like(f); outlet_e[:, -1] = f[:, -1]

    j = jnp.asarray

    def j32(x):
        return jnp.asarray(np.asarray(x, dtype=np.float32))

    return Case(
        grid=grid, nu=float(nu), cut=cut,
        fluid=j(f), sdf=j(sdf), inlet_u=j(inlet_u),
        open_e=j(open_e), open_w=j(open_w), open_n=j(open_n), open_s=j(open_s),
        wall_e=j(wall_e), wall_w=j(wall_w), wall_n=j(wall_n), wall_s=j(wall_s),
        inlet_w=j(inlet_w), outlet_e=j(outlet_e),
        alpha=j32(cg["alpha"]), wall_ax=j32(cg["wall_ax"]),
        wall_ay=j32(cg["wall_ay"]), wall_len=j32(cg["wall_len"]),
        wall_dist=j32(cg["wall_dist"]),
    )


def initial_flow(case: Case, dt0: float = 1e-3) -> Flow:
    """Quiescent-but-consistent initial state: inlet profile swept through
    the domain (the reference starts from a potential-ish init via OpenFOAM's
    0/ directory), zero pressure, fluxes consistent with U."""
    grid = case.grid
    u = jnp.broadcast_to(case.inlet_u[:, None], grid.shape) * case.fluid
    v = jnp.zeros(grid.shape, dtype=jnp.float32)
    p = jnp.zeros(grid.shape, dtype=jnp.float32)
    phi_x, phi_y = fluxes_from_velocity(case, u, v)
    return Flow(u=u, v=v, p=p, phi_x=phi_x, phi_y=phi_y,
                dt=jnp.float32(dt0), t=jnp.float32(0.0),
                u_prev=u, v_prev=v, p_prev=p)


_FLOW_FIELDS = ("u", "v", "p", "phi_x", "phi_y", "dt", "t",
                "u_prev", "v_prev", "p_prev")


def save_flow(path: str, flow: Flow, turb=None, extra=None) -> None:
    """Persist the full solver state for restart (the reference relies on
    OpenFOAM's `startFrom latestTime`, controlDict:20). `turb` optionally
    appends the k-omega SST state (the 0/k, 0/omega restart fields);
    `extra` appends caller arrays (e.g. a force-series history). The
    write is atomic (tmp + rename) so a mid-write kill cannot truncate
    the previous checkpoint."""
    import os

    arrays = {f: np.asarray(getattr(flow, f)) for f in _FLOW_FIELDS}
    if turb is not None:
        arrays.update({f"turb_{f}": np.asarray(getattr(turb, f))
                       for f in ("k", "omega", "nu_t", "k_in", "w_in")})
    if extra:
        arrays.update({k: np.asarray(v) for k, v in extra.items()})
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def load_flow(path) -> Flow:
    """Load a Flow from a save_flow .npz path (or an already-opened
    NpzFile, to avoid re-parsing when the caller also reads extras)."""
    d = path if hasattr(path, "files") else np.load(path)
    return Flow(**{k: jnp.asarray(d[k]) for k in _FLOW_FIELDS})


def load_turbulence(path):
    """Returns the saved TurbState, or None if the state file is laminar."""
    d = path if hasattr(path, "files") else np.load(path)
    if "turb_k" not in d.files:
        return None
    from .turbulence import TurbState
    return TurbState(k=jnp.asarray(d["turb_k"]),
                     omega=jnp.asarray(d["turb_omega"]),
                     nu_t=jnp.asarray(d["turb_nu_t"]),
                     k_in=jnp.asarray(d["turb_k_in"]),
                     w_in=jnp.asarray(d["turb_w_in"]))


def fluxes_from_velocity(case: Case, u: jnp.ndarray, v: jnp.ndarray):
    """Linear face interpolation of U dotted with face areas (fvc::flux).

    x-face j (of nx+1) sits between cells j-1 and j; its openness is
    open_w[:, j]. Inlet face = fixed profile, outlet face = zero-grad
    (upwind cell value), wall/solid faces = 0.
    """
    grid = case.grid
    if not grid.stretched:
        dy, dx = grid.dy, grid.dx
        face_val_x = 0.5 * (u[:, :-1] + u[:, 1:])      # faces j=1..nx-1
        face_val_y = 0.5 * (v[:-1, :] + v[1:, :])      # faces i=1..ny-1
        dy_col = dy * jnp.ones((grid.ny, 1), dtype=u.dtype)
    else:
        # distance-weighted face interpolation + per-row/column face areas
        xs, ys = grid.spacing_arrays(np)
        wfx = jnp.asarray((xs[1:] / (xs[:-1] + xs[1:]))
                          .astype(np.float32))[None, :]   # weight of LEFT cell
        wfy = jnp.asarray((ys[1:] / (ys[:-1] + ys[1:]))
                          .astype(np.float32))[:, None]
        face_val_x = wfx * u[:, :-1] + (1.0 - wfx) * u[:, 1:]
        face_val_y = wfy * v[:-1, :] + (1.0 - wfy) * v[1:, :]
        dy = jnp.asarray(ys.astype(np.float32))[:, None]  # x-face areas/row
        dx = jnp.asarray(xs.astype(np.float32))[None, :]  # y-face areas/col
        dy_col = dy

    phi_x = jnp.concatenate([
        case.inlet_u[:, None] * case.fluid[:, :1] * dy_col,
        face_val_x * case.open_w[:, 1:] * dy,
        u[:, -1:] * case.fluid[:, -1:] * dy_col,
    ], axis=1)

    zrow = jnp.zeros((1, grid.nx), dtype=u.dtype)
    phi_y = jnp.concatenate([
        zrow,
        face_val_y * case.open_s[1:, :] * dx,
        zrow,
    ], axis=0)
    return phi_x, phi_y
