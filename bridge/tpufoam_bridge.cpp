/* tpufoam host bridge implementation. See tpufoam_bridge.h.
 *
 * Wire protocol (little-endian, over a SOCK_STREAM unix socket):
 *   client -> server : INIT  { magic 'TBI1', u64 n_cells, n_top, n_obst,
 *                              char shm_path[108] }
 *   server -> client : u32 status (0 = ok)
 *   client -> server : STEP  { magic 'TBS1' }
 *   server -> client : u32 status
 *   client -> server : BYE   { magic 'TBX1' }   (best-effort)
 *
 * Shared-memory arena layout (all float64):
 *   [ cells n_cells*5 | top n_top*2 | obst n_obst*2 | p_out n_cells
 *     | out n_cells ]
 * `out` carries the model's raw output (pre-guard) — the reference's
 * `out` diagnostic field (createFields.H:44-56).
 */

#include "tpufoam_bridge.h"

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <ctime>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

namespace {

struct __attribute__((packed)) InitMsg {
  char magic[4];
  uint64_t n_cells, n_top, n_obst;
  char shm_path[108];
};
static_assert(sizeof(InitMsg) == 136, "wire layout must match server");

struct __attribute__((packed)) InitMsg2 {
  char magic[4];
  uint64_t n_cells, n_top, n_obst;
  int32_t rank, n_ranks, world_id;
  char shm_path[108];
};
static_assert(sizeof(InitMsg2) == 148, "wire layout must match server");

bool send_all(int fd, const void *buf, size_t n) {
  const char *p = static_cast<const char *>(buf);
  while (n) {
    ssize_t k = ::send(fd, p, n, MSG_NOSIGNAL);
    if (k <= 0) {
      if (k < 0 && errno == EINTR) continue;
      return false;
    }
    p += k;
    n -= static_cast<size_t>(k);
  }
  return true;
}

bool recv_all(int fd, void *buf, size_t n) {
  char *p = static_cast<char *>(buf);
  while (n) {
    ssize_t k = ::recv(fd, p, n, 0);
    if (k <= 0) {
      if (k < 0 && errno == EINTR) continue;
      return false;
    }
    p += k;
    n -= static_cast<size_t>(k);
  }
  return true;
}

double now_ms() {
  timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec * 1e3 + ts.tv_nsec * 1e-6;
}

}  // namespace

struct tb_handle {
  int fd = -1;
  size_t n_cells = 0, n_top = 0, n_obst = 0;
  double *arena = nullptr;
  size_t arena_bytes = 0;
  char shm_name[108] = {0};
  double last_ms = 0.0;

  double *cells() { return arena; }
  double *top() { return arena + n_cells * 5; }
  double *obst() { return top() + n_top * 2; }
  double *p_out() { return obst() + n_obst * 2; }
  double *sm_out() { return p_out() + n_cells; }
};

namespace {

/* Shared arena + socket setup; the caller then sends its INIT message.
 * `tag` distinguishes per-process handles (multi-rank clients in one
 * process must not collide on the shm name). */
tb_handle *tb_setup(const char *socket_path,
                    const double *cells, size_t n_cells,
                    const double *top, size_t n_top,
                    const double *obst, size_t n_obst, int tag) {
  tb_handle *h = new tb_handle();
  h->n_cells = n_cells;
  h->n_top = n_top;
  h->n_obst = n_obst;
  h->arena_bytes = sizeof(double) *
      (n_cells * 5 + n_top * 2 + n_obst * 2 + 2 * n_cells);

  std::snprintf(h->shm_name, sizeof(h->shm_name), "/tpufoam_bridge_%d_%d",
                static_cast<int>(::getpid()), tag);
  int shm_fd = ::shm_open(h->shm_name, O_CREAT | O_RDWR, 0600);
  if (shm_fd < 0) { delete h; return nullptr; }
  if (::ftruncate(shm_fd, static_cast<off_t>(h->arena_bytes)) != 0) {
    ::close(shm_fd); ::shm_unlink(h->shm_name); delete h; return nullptr;
  }
  h->arena = static_cast<double *>(::mmap(nullptr, h->arena_bytes,
                                          PROT_READ | PROT_WRITE, MAP_SHARED,
                                          shm_fd, 0));
  ::close(shm_fd);
  if (h->arena == MAP_FAILED) {
    ::shm_unlink(h->shm_name); delete h; return nullptr;
  }

  std::memcpy(h->cells(), cells, sizeof(double) * n_cells * 5);
  std::memcpy(h->top(), top, sizeof(double) * n_top * 2);
  std::memcpy(h->obst(), obst, sizeof(double) * n_obst * 2);

  h->fd = ::socket(AF_UNIX, SOCK_STREAM, 0);
  sockaddr_un addr{};
  addr.sun_family = AF_UNIX;
  std::strncpy(addr.sun_path, socket_path, sizeof(addr.sun_path) - 1);
  if (::connect(h->fd, reinterpret_cast<sockaddr *>(&addr), sizeof(addr)) != 0) {
    tb_close(h);
    return nullptr;
  }
  return h;
}

}  // namespace

extern "C" tb_handle *tb_init(const char *socket_path,
                              const double *cells, size_t n_cells,
                              const double *top, size_t n_top,
                              const double *obst, size_t n_obst) {
  tb_handle *h = tb_setup(socket_path, cells, n_cells, top, n_top,
                          obst, n_obst, /*tag=*/0);
  if (!h) return nullptr;

  InitMsg msg{};
  std::memcpy(msg.magic, "TBI1", 4);
  msg.n_cells = n_cells;
  msg.n_top = n_top;
  msg.n_obst = n_obst;
  std::strncpy(msg.shm_path, h->shm_name, sizeof(msg.shm_path) - 1);
  uint32_t status = 1;
  if (!send_all(h->fd, &msg, sizeof(msg)) ||
      !recv_all(h->fd, &status, sizeof(status)) || status != 0) {
    tb_close(h);
    return nullptr;
  }
  return h;
}

extern "C" tb_handle *tb_init_rank(const char *socket_path,
                                   const double *cells, size_t n_cells,
                                   const double *top, size_t n_top,
                                   const double *obst, size_t n_obst,
                                   int rank, int n_ranks, int world_id) {
  if (rank < 0 || n_ranks <= 0 || rank >= n_ranks) return nullptr;
  tb_handle *h = tb_setup(socket_path, cells, n_cells, top, n_top,
                          obst, n_obst, /*tag=*/1 + rank);
  if (!h) return nullptr;

  InitMsg2 msg{};
  std::memcpy(msg.magic, "TBI2", 4);
  msg.n_cells = n_cells;
  msg.n_top = n_top;
  msg.n_obst = n_obst;
  msg.rank = rank;
  msg.n_ranks = n_ranks;
  msg.world_id = world_id;
  std::strncpy(msg.shm_path, h->shm_name, sizeof(msg.shm_path) - 1);
  uint32_t status = 1;
  if (!send_all(h->fd, &msg, sizeof(msg)) ||
      !recv_all(h->fd, &status, sizeof(status)) || status != 0) {
    tb_close(h);
    return nullptr;
  }
  return h;
}

extern "C" int tb_step_out(tb_handle *h, const double *cells, double *p_out,
                           double *sm_out) {
  if (!h || h->fd < 0) return -1;
  double t0 = now_ms();
  std::memcpy(h->cells(), cells, sizeof(double) * h->n_cells * 5);
  char magic[4] = {'T', 'B', 'S', '1'};
  uint32_t status = 1;
  if (!send_all(h->fd, magic, 4) ||
      !recv_all(h->fd, &status, sizeof(status)) || status != 0)
    return -1;
  std::memcpy(p_out, h->p_out(), sizeof(double) * h->n_cells);
  if (sm_out)
    std::memcpy(sm_out, h->sm_out(), sizeof(double) * h->n_cells);
  h->last_ms = now_ms() - t0;
  return 0;
}

extern "C" int tb_step(tb_handle *h, const double *cells, double *p_out) {
  return tb_step_out(h, cells, p_out, nullptr);
}

extern "C" double tb_last_step_ms(const tb_handle *h) {
  return h ? h->last_ms : -1.0;
}

extern "C" void tb_close(tb_handle *h) {
  if (!h) return;
  if (h->fd >= 0) {
    char magic[4] = {'T', 'B', 'X', '1'};
    send_all(h->fd, magic, 4);
    ::close(h->fd);
  }
  if (h->arena && h->arena != MAP_FAILED) ::munmap(h->arena, h->arena_bytes);
  if (h->shm_name[0]) ::shm_unlink(h->shm_name);
  delete h;
}
