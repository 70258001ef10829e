"""tpufoam serving process for external CFD solvers.

Python side of the C bridge (bridge/tpufoam_bridge.{h,cpp}): replaces the
reference's in-process python_module
(Thesis_Work/Chapter5/parallelized/test_case/python_module.py):

  init (the init_func role, :172-247): map the client's shared-memory
  arena, build the uniform grid, Delaunay resampling both directions, SDF
  and cell-index maps — once per case.

  step (the py_func role, :249-517): read [Ux, Uy, Cx, Cy, p] from shm,
  nondimensionalize by the instantaneous U_max (:270-273), run the pressure
  model on device, resample back to the solver's cells, redimensionalize
  (:490), apply the near-wall guard + non-finite fallback (:492-496), and
  write p into the arena's output region.

Two client modes:
  single-rank (TBI1): one connection carries the whole case — the
  reference's gather-to-rank-0 shape (python_module.py is only ever
  called on the master after an MPI gather).
  multi-rank (TBI2, `tb_init_rank`): each solver rank connects with its
  LOCAL cell partition; the server barriers the ranks per step, assembles
  the global point cloud once, runs the model ONCE on device, and
  scatters each rank's slice back into its own shm arena. This removes
  the client-side MPI gather entirely — the decomposed solver keeps its
  decomposition and the aggregation happens where the data is already
  headed (the serving host), one device program per step regardless of
  rank count.

Pressure models: 'identity' (transport validation), 'sm' (a trained
SurrogateBundle), 'poisson' (solve the pressure Poisson equation from the
current velocity field with multigrid — a capability the reference's
embedded module does not have).
"""

from __future__ import annotations

import mmap
import os
import socket
import struct
import threading

import numpy as np

_INIT = struct.Struct("<4sQQQ108s")          # TBI1 (magic included)
_INIT2 = struct.Struct("<4sQQQiii108s")      # TBI2: + rank, n_ranks, world
_STATUS_OK = struct.pack("<I", 0)
_STATUS_ERR = struct.pack("<I", 1)
_WORLD_TIMEOUT_S = 120.0


class _Compute:
    """The per-case model state + step computation, independent of where
    the cell buffers live (one shm arena or a concatenation of per-rank
    arenas)."""

    def __init__(self, model, delta: float, nu: float):
        self.model = model
        self.delta = delta
        self.nu = nu
        self.state = None

    def prepare(self, cells: np.ndarray, top: np.ndarray, obst: np.ndarray):
        """One-time mesh prep (init_func / computeOnlyOnce role)."""
        if self.model == "identity":
            return
        import jax.numpy as jnp

        from ..eval.evaluation import UnstructuredCase
        from ..utils.hdf5_io import SimFrame

        fr = SimFrame(
            data=np.ascontiguousarray(
                cells[:, [0, 1, 4, 2, 3]]).astype(np.float32),
            top=top.astype(np.float32),
            obst=obst.astype(np.float32),
            channels=("Ux", "Uy", "p", "Cx", "Cy"),
        )
        self.ucase = UnstructuredCase.from_frame(fr, self.delta, self.nu)
        self.p_prev_grid = jnp.zeros(self.ucase.case.grid.shape)

        if isinstance(self.model, str) and self.model.startswith("sm:"):
            from ..surrogate.pipeline import SurrogateBundle, make_predictor
            bundle = SurrogateBundle.load(self.model[3:])
            self.predictor = make_predictor(bundle, stitch="lstsq")

    def step(self, cells: np.ndarray):
        """cells (n, 5) -> (p_cells, raw_model_out) both (n,)."""
        if self.model == "identity":
            p = np.ascontiguousarray(cells[:, 4])
            return p, p

        import jax.numpy as jnp

        uc = self.ucase
        case = uc.case
        u = uc.grid_field(cells[:, 0].astype(np.float32))
        v = uc.grid_field(cells[:, 1].astype(np.float32))
        p = uc.grid_field(cells[:, 4].astype(np.float32))

        if self.model == "poisson":
            p_new = self._poisson_pressure(case, u, v, p)
        else:  # surrogate
            aux = dict(u=u, v=v, p=p, u_prev=self.u_prev if self.state else u,
                       v_prev=self.v_prev if self.state else v,
                       p_prev=self.p_prev_grid)
            p_new = self.predictor(case, self.p_prev_grid, aux)
        self.u_prev, self.v_prev = u, v
        self.p_prev_grid = p_new
        self.state = True

        # grid -> solver cells, near-wall guard + non-finite fallback
        p_cells = np.asarray(uc.resample_back(jnp.asarray(p_new).reshape(-1)))
        raw = np.nan_to_num(p_cells)   # raw prediction (`out`)
        sdf_cells = np.asarray(uc.resample_back(case.sdf.reshape(-1)))
        p_old = cells[:, 4]
        p_cells = np.where(sdf_cells < 0.05, p_old, p_cells)
        p_cells = np.where(np.isfinite(p_cells), p_cells, p_old)
        return p_cells, raw

    def _poisson_pressure(self, case, u, v, p):
        """Classical pressure Poisson solve from the current velocity —
        multigrid on laplacian(p) = -div(U)/dt-like rhs via the fv layer."""
        import jax.numpy as jnp

        from ..fv.case import fluxes_from_velocity
        from ..fv.pressure import pressure_coeffs, pressure_rhs
        from ..solvers.multigrid import mgcg_pressure

        phi_x, phi_y = fluxes_from_velocity(case, u, v)
        rau = jnp.ones(case.grid.shape, dtype=jnp.float32) * case.fluid
        coef = pressure_coeffs(case, rau)
        rhs = pressure_rhs(case, phi_x, phi_y)
        return mgcg_pressure(coef, rhs, x0=p, rtol=1e-6).x * case.fluid


class _Arena:
    """A client's shared-memory mapping: views into its field regions."""

    def __init__(self, n_cells: int, n_top: int, n_obst: int, shm_path: str):
        self.n_cells, self.n_top, self.n_obst = n_cells, n_top, n_obst
        fd = os.open(f"/dev/shm{shm_path}", os.O_RDWR)
        total = 8 * (n_cells * 5 + n_top * 2 + n_obst * 2 + 2 * n_cells)
        self.mm = mmap.mmap(fd, total)
        os.close(fd)
        buf = np.frombuffer(self.mm, dtype=np.float64)
        o1 = n_cells * 5
        o2 = o1 + n_top * 2
        o3 = o2 + n_obst * 2
        o4 = o3 + n_cells
        self.cells = buf[:o1].reshape(n_cells, 5)
        self.top = buf[o1:o2].reshape(n_top, 2)
        self.obst = buf[o2:o3].reshape(n_obst, 2)
        self.p_out = buf[o3:o4]
        # raw model output before the near-wall/non-finite guards — the
        # reference's `out` diagnostic field (createFields.H:44-56,
        # PythonComm.H:35)
        self.sm_out = buf[o4:]

    def close(self):
        # drop the numpy views into the mapping first: mmap.close() raises
        # BufferError while exported buffer pointers are alive
        self.cells = None
        self.top = None
        self.obst = None
        self.p_out = None
        self.sm_out = None
        try:
            self.mm.close()
        except BufferError:
            pass  # a view escaped (e.g. held by a caller); the mapping is
            # reclaimed when the last view dies


class _Session:
    """Single-rank session: one arena + its own compute."""

    def __init__(self, n_cells: int, n_top: int, n_obst: int, shm_path: str,
                 model, delta: float, nu: float):
        self.arena = _Arena(n_cells, n_top, n_obst, shm_path)
        self.compute = _Compute(model, delta, nu)
        self.compute.prepare(self.arena.cells, self.arena.top,
                             self.arena.obst)

    def step(self):
        p, raw = self.compute.step(self.arena.cells)
        self.arena.sm_out[:] = raw
        self.arena.p_out[:] = p

    def close(self):
        self.arena.close()


class _World:
    """A multi-rank case: per-step barrier + gather/compute/scatter.

    The LAST rank to arrive at each barrier performs the global work (the
    others block on the condition variable): concatenate the per-rank cell
    views in rank order, run the model once, and write each rank's slice
    back into its own arena. Equivalent by construction to a single-rank
    session over the concatenated point cloud — tested in
    tests/test_bridge.py (1-rank vs 2-rank Poisson equality)."""

    def __init__(self, world_id: int, n_ranks: int, model, delta, nu):
        self.world_id = world_id
        self.n_ranks = n_ranks
        self.compute = _Compute(model, delta, nu)
        self.cond = threading.Condition()
        self.arenas: dict[int, _Arena] = {}
        self.ready = False
        # fatal world errors (init failure, barrier timeout, rank loss):
        # poison the world permanently
        self.error: Exception | None = None
        # transient per-round compute errors: reported as STATUS_ERR for
        # that step only, then cleared — matching the single-rank
        # _Session's per-step recovery semantics
        self.step_error: Exception | None = None
        self.step_no = 0
        self.arrived = 0
        self.left = 0

    def _fail(self, e: Exception):
        self.error = e
        self.cond.notify_all()

    def join(self, rank: int, arena: _Arena):
        """Register a rank; the last one runs the one-time mesh prep.
        Returns after prep (or raises on any world error)."""
        with self.cond:
            if rank in self.arenas or not (0 <= rank < self.n_ranks):
                raise ValueError(f"bad rank {rank}/{self.n_ranks}")
            self.arenas[rank] = arena
            if len(self.arenas) == self.n_ranks:
                try:
                    cells = np.concatenate(
                        [self.arenas[r].cells for r in range(self.n_ranks)])
                    a0 = self.arenas[0]
                    self.compute.prepare(cells, a0.top, a0.obst)
                    self.ready = True
                    self.cond.notify_all()
                except Exception as e:
                    self._fail(e)
            else:
                deadline = _time() + _WORLD_TIMEOUT_S
                while not self.ready and self.error is None:
                    if not self.cond.wait(timeout=1.0) and _time() > deadline:
                        self._fail(TimeoutError(
                            f"world {self.world_id}: "
                            f"{len(self.arenas)}/{self.n_ranks} ranks"))
            if self.error is not None:
                raise RuntimeError(f"world init failed: {self.error}")

    def step(self, rank: int):
        with self.cond:
            my_step = self.step_no
            self.arrived += 1
            if self.arrived == self.n_ranks:
                self.arrived = 0
                try:
                    cells = np.concatenate(
                        [self.arenas[r].cells for r in range(self.n_ranks)])
                    p, raw = self.compute.step(cells)
                    off = 0
                    for r in range(self.n_ranks):
                        a = self.arenas[r]
                        a.p_out[:] = p[off:off + a.n_cells]
                        a.sm_out[:] = raw[off:off + a.n_cells]
                        off += a.n_cells
                    self.step_error = None
                except Exception as e:
                    # transient: fail THIS round for all ranks, recover next
                    self.step_error = e
                self.step_no += 1
                self.cond.notify_all()
            else:
                deadline = _time() + _WORLD_TIMEOUT_S
                while self.step_no == my_step and self.error is None:
                    if not self.cond.wait(timeout=1.0) and _time() > deadline:
                        self._fail(TimeoutError(
                            f"world {self.world_id}: step barrier"))
            # no overwrite race on step_error: the next round can only
            # complete after every rank (including this waiter) returned
            if self.error is not None:
                raise RuntimeError(f"world step failed: {self.error}")
            if self.step_error is not None:
                raise RuntimeError(f"world step failed: {self.step_error}")

    def leave(self, rank: int) -> bool:
        """Close a rank's arena; wake any barrier waiters (a departed rank
        can never complete the barrier). True when the world is empty."""
        with self.cond:
            a = self.arenas.pop(rank, None)
            if a is not None:
                a.close()
            self.left += 1
            if self.arenas and self.arrived > 0:
                self._fail(ConnectionError(f"rank {rank} left mid-step"))
            return self.left >= self.n_ranks


def _time():
    import time
    return time.monotonic()


class BridgeServer:
    """One thread per connection; single-rank (TBI1) sessions are
    independent, multi-rank (TBI2) connections rendezvous in a _World."""

    def __init__(self, socket_path: str, model: str = "identity",
                 delta: float = 0.02, nu: float = 8e-3):
        self.socket_path = socket_path
        self.model = model
        self.delta = delta
        self.nu = nu
        self._stop = threading.Event()
        self._worlds: dict[int, _World] = {}
        self._worlds_lock = threading.Lock()
        if os.path.exists(socket_path):
            os.unlink(socket_path)
        self.sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self.sock.bind(socket_path)
        self.sock.listen(16)
        self.sock.settimeout(0.5)

    def serve_forever(self):
        threads = []
        while not self._stop.is_set():
            try:
                conn, _ = self.sock.accept()
            except socket.timeout:
                continue
            th = threading.Thread(target=self._dispatch, args=(conn,),
                                  daemon=True)
            th.start()
            threads = [t for t in threads if t.is_alive()]
            threads.append(th)
        for th in threads:
            th.join(timeout=2.0)
        self.sock.close()
        if os.path.exists(self.socket_path):
            os.unlink(self.socket_path)

    def stop(self):
        self._stop.set()

    def _recv_all(self, conn, n):
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("client closed")
            buf += chunk
        return buf

    def _dispatch(self, conn):
        try:
            magic = self._recv_all(conn, 4)
            if magic == b"TBI1":
                self._handle_single(conn, magic)
            elif magic == b"TBI2":
                self._handle_rank(conn, magic)
            else:
                conn.sendall(_STATUS_ERR)
        except ConnectionError:
            pass
        finally:
            conn.close()

    def _step_loop(self, conn, do_step):
        """Shared STEP/BYE loop; `do_step()` raises on failure."""
        while True:
            magic = self._recv_all(conn, 4)
            if magic == b"TBX1":
                return
            if magic != b"TBS1":
                conn.sendall(_STATUS_ERR)
                return
            try:
                do_step()
                conn.sendall(_STATUS_OK)
            except Exception as e:
                print(f"bridge step failed: {e}", flush=True)
                conn.sendall(_STATUS_ERR)

    def _handle_single(self, conn, magic):
        raw = magic + self._recv_all(conn, _INIT.size - 4)
        _, n_cells, n_top, n_obst, shm = _INIT.unpack(raw)
        shm_path = shm.split(b"\0")[0].decode()
        try:
            sess = _Session(n_cells, n_top, n_obst, shm_path, self.model,
                            self.delta, self.nu)
            conn.sendall(_STATUS_OK)
        except Exception as e:  # pragma: no cover - init failure path
            print(f"bridge init failed: {e}", flush=True)
            conn.sendall(_STATUS_ERR)
            return
        try:
            self._step_loop(conn, sess.step)
        finally:
            sess.close()

    def _handle_rank(self, conn, magic):
        raw = magic + self._recv_all(conn, _INIT2.size - 4)
        _, n_cells, n_top, n_obst, rank, n_ranks, world_id, shm = \
            _INIT2.unpack(raw)
        shm_path = shm.split(b"\0")[0].decode()
        world = None
        arena = None
        try:
            with self._worlds_lock:
                world = self._worlds.get(world_id)
                if world is None:
                    world = _World(world_id, n_ranks, self.model,
                                   self.delta, self.nu)
                    self._worlds[world_id] = world
                elif world.n_ranks != n_ranks:
                    raise ValueError(
                        f"world {world_id}: n_ranks mismatch "
                        f"({n_ranks} vs {world.n_ranks})")
            arena = _Arena(n_cells, n_top, n_obst, shm_path)
            world.join(rank, arena)
            conn.sendall(_STATUS_OK)
        except Exception as e:
            print(f"bridge rank init failed: {e}", flush=True)
            try:
                conn.sendall(_STATUS_ERR)
            except OSError:
                pass
            if world is not None:
                # if join rejected the rank before registering the arena,
                # leave() won't find it — close the mapping here
                if arena is not None and world.arenas.get(rank) is not arena:
                    arena.close()
                self._reap(world, rank)
            return
        try:
            self._step_loop(conn, lambda: world.step(rank))
        finally:
            self._reap(world, rank)

    def _reap(self, world: _World, rank: int):
        if world.leave(rank):
            with self._worlds_lock:
                if self._worlds.get(world.world_id) is world:
                    del self._worlds[world.world_id]


def serve(socket_path: str, model: str = "identity", delta: float = 0.02,
          nu: float = 8e-3):
    """Blocking entry point: `python -m tpufoam.bridge.server /tmp/tb.sock sm:/path`."""
    BridgeServer(socket_path, model, delta, nu).serve_forever()


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("socket_path")
    ap.add_argument("model", nargs="?", default="identity",
                    help="identity | poisson | sm:<bundle_dir>")
    ap.add_argument("--delta", type=float, default=0.02)
    ap.add_argument("--nu", type=float, default=8e-3)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force a JAX backend (the axon TPU plugin ignores "
                         "JAX_PLATFORMS; this sets jax.config before init)")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    serve(args.socket_path, args.model, args.delta, args.nu)
