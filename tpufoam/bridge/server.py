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

No MPI, no embedded interpreter, no gather-to-root: the client sends whole-
case buffers (a multi-rank client would aggregate before calling — or run
one bridge per rank against a sharded server in a future revision).

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

_INIT = struct.Struct("<4sQQQ108s")
_STATUS_OK = struct.pack("<I", 0)
_STATUS_ERR = struct.pack("<I", 1)


class _Session:
    def __init__(self, n_cells: int, n_top: int, n_obst: int, shm_path: str,
                 model, delta: float, nu: float):
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
        self.model = model
        self.state = None
        self._prepare(delta, nu)

    def _prepare(self, delta: float, nu: float):
        """One-time mesh prep (init_func / computeOnlyOnce role)."""
        if self.model == "identity":
            return
        import jax.numpy as jnp

        from ..eval.evaluation import UnstructuredCase
        from ..utils.hdf5_io import SimFrame

        fr = SimFrame(
            data=np.ascontiguousarray(
                self.cells[:, [0, 1, 4, 2, 3]]).astype(np.float32),
            top=self.top.astype(np.float32),
            obst=self.obst.astype(np.float32),
            channels=("Ux", "Uy", "p", "Cx", "Cy"),
        )
        self.ucase = UnstructuredCase.from_frame(fr, delta, nu)
        self.p_prev_grid = jnp.zeros(self.ucase.case.grid.shape)

        if isinstance(self.model, str) and self.model.startswith("sm:"):
            from ..surrogate.pipeline import SurrogateBundle, make_predictor
            bundle = SurrogateBundle.load(self.model[3:])
            self.predictor = make_predictor(bundle, stitch="lstsq")

    def step(self):
        if self.model == "identity":
            self.p_out[:] = self.cells[:, 4]
            self.sm_out[:] = self.cells[:, 4]
            return

        import jax.numpy as jnp

        uc = self.ucase
        case = uc.case
        u = uc.grid_field(self.cells[:, 0].astype(np.float32))
        v = uc.grid_field(self.cells[:, 1].astype(np.float32))
        p = uc.grid_field(self.cells[:, 4].astype(np.float32))

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
        self.sm_out[:] = np.nan_to_num(p_cells)   # raw prediction (`out`)
        sdf_cells = np.asarray(uc.resample_back(case.sdf.reshape(-1)))
        p_old = self.cells[:, 4]
        p_cells = np.where(sdf_cells < 0.05, p_old, p_cells)
        p_cells = np.where(np.isfinite(p_cells), p_cells, p_old)
        self.p_out[:] = p_cells

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

    def close(self):
        # drop the numpy views into the mapping first: mmap.close() raises
        # BufferError while exported buffer pointers are alive
        self.cells = None
        self.top = None
        self.obst = None
        self.p_out = None
        try:
            self.mm.close()
        except BufferError:
            pass  # a view escaped (e.g. held by a caller); the mapping is
            # reclaimed when the last view dies


class BridgeServer:
    """Accepts one client per connection; runs sessions until BYE."""

    def __init__(self, socket_path: str, model: str = "identity",
                 delta: float = 0.02, nu: float = 8e-3):
        self.socket_path = socket_path
        self.model = model
        self.delta = delta
        self.nu = nu
        self._stop = threading.Event()
        if os.path.exists(socket_path):
            os.unlink(socket_path)
        self.sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self.sock.bind(socket_path)
        self.sock.listen(4)
        self.sock.settimeout(0.5)

    def serve_forever(self):
        while not self._stop.is_set():
            try:
                conn, _ = self.sock.accept()
            except socket.timeout:
                continue
            try:
                self._handle(conn)
            finally:
                conn.close()
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

    def _handle(self, conn):
        raw = self._recv_all(conn, _INIT.size)
        magic, n_cells, n_top, n_obst, shm = _INIT.unpack(raw)
        if magic != b"TBI1":
            conn.sendall(_STATUS_ERR)
            return
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
            while True:
                magic = self._recv_all(conn, 4)
                if magic == b"TBX1":
                    break
                if magic != b"TBS1":
                    conn.sendall(_STATUS_ERR)
                    break
                try:
                    sess.step()
                    conn.sendall(_STATUS_OK)
                except Exception as e:
                    print(f"bridge step failed: {e}", flush=True)
                    conn.sendall(_STATUS_ERR)
        except ConnectionError:
            pass
        finally:
            sess.close()


def serve(socket_path: str, model: str = "identity", delta: float = 0.02,
          nu: float = 8e-3):
    """Blocking entry point: `python -m tpufoam.bridge.server /tmp/tb.sock sm:/path`."""
    BridgeServer(socket_path, model, delta, nu).serve_forever()


if __name__ == "__main__":
    import sys
    serve(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "identity")
