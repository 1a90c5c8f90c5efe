// Grid A* shortest path — native host-path equivalent of the reference's
// pyastar2d dependency (reference warehouse.py:308; SURVEY.md §2.7).
//
// Semantics match pyastar2d.astar_path:
//   * weights: float32 (h, w), all >= 1; INF (or any value > max_cost)
//     marks blocked cells;
//   * moving onto a cell costs that cell's weight;
//   * heuristic: L1 (manhattan) for 4-connected, diagonal distance when
//     allow_diagonal is set;
//   * returns the path INCLUDING the start cell, or length 0 if no path.
//
// Built as a plain C ABI shared object and bound via ctypes
// (swarm_ode_tpu/utils/astar.py) — no pybind11 required.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <vector>

namespace {

struct Node {
  float f;
  int32_t idx;
  // Tie-break on smaller index for determinism.
  bool operator>(const Node& o) const {
    if (f != o.f) return f > o.f;
    return idx > o.idx;
  }
};

inline float heuristic(int y0, int x0, int y1, int x1, bool diag) {
  int dy = std::abs(y0 - y1), dx = std::abs(x0 - x1);
  if (!diag) return static_cast<float>(dy + dx);
  return static_cast<float>(std::max(dy, dx));
}

}  // namespace

extern "C" {

// Returns path length (number of cells incl. start), 0 if unreachable.
// out_path receives flat indices (y * w + x) from start to goal; its
// capacity must be >= h * w.
int32_t astar_path_c(const float* weights, int32_t h, int32_t w,
                     int32_t start, int32_t goal, int32_t allow_diagonal,
                     int32_t* out_path) {
  const int32_t n = h * w;
  if (start < 0 || start >= n || goal < 0 || goal >= n) return 0;
  const float INF = std::numeric_limits<float>::infinity();
  if (!(weights[goal] < INF)) return 0;

  std::vector<float> g(n, INF);
  std::vector<int32_t> came(n, -1);
  std::vector<uint8_t> closed(n, 0);
  std::priority_queue<Node, std::vector<Node>, std::greater<Node>> open;

  const int gy = goal / w, gx = goal % w;
  const bool diag = allow_diagonal != 0;
  g[start] = 0.0f;
  open.push({heuristic(start / w, start % w, gy, gx, diag), start});

  static const int dy4[] = {-1, 1, 0, 0};
  static const int dx4[] = {0, 0, -1, 1};
  static const int dy8[] = {-1, 1, 0, 0, -1, -1, 1, 1};
  static const int dx8[] = {0, 0, -1, 1, -1, 1, -1, 1};
  const int* dys = diag ? dy8 : dy4;
  const int* dxs = diag ? dx8 : dx4;
  const int ndirs = diag ? 8 : 4;

  while (!open.empty()) {
    Node cur = open.top();
    open.pop();
    if (closed[cur.idx]) continue;
    closed[cur.idx] = 1;
    if (cur.idx == goal) break;
    const int cy = cur.idx / w, cx = cur.idx % w;
    for (int d = 0; d < ndirs; ++d) {
      const int ny = cy + dys[d], nx = cx + dxs[d];
      if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
      const int32_t ni = ny * w + nx;
      const float cost = weights[ni];
      if (!(cost < INF)) continue;
      const float ng = g[cur.idx] + cost;
      if (ng < g[ni]) {
        g[ni] = ng;
        came[ni] = cur.idx;
        open.push({ng + heuristic(ny, nx, gy, gx, diag), ni});
      }
    }
  }

  if (!(g[goal] < INF)) return 0;
  // Reconstruct (reversed), then flip into out_path.
  std::vector<int32_t> rev;
  for (int32_t c = goal; c != -1; c = came[c]) rev.push_back(c);
  const int32_t len = static_cast<int32_t>(rev.size());
  for (int32_t i = 0; i < len; ++i) out_path[i] = rev[len - 1 - i];
  return len;
}

// Batched BFS distance fields on unit-cost grids: host-side counterpart of
// the on-device dynamic replanner, used by tooling/validation. For each of
// the `t` targets, fills dist[t, :, :] with shortest path lengths over the
// passable mask (1 = free), INT32_MAX where unreachable.
void bfs_fields_c(const uint8_t* passable, int32_t h, int32_t w,
                  const int32_t* targets, int32_t num_targets,
                  int32_t* dist_out) {
  const int32_t n = h * w;
  std::vector<int32_t> queue(n);
  for (int32_t t = 0; t < num_targets; ++t) {
    int32_t* dist = dist_out + static_cast<int64_t>(t) * n;
    std::fill(dist, dist + n, std::numeric_limits<int32_t>::max());
    int32_t head = 0, tail = 0;
    const int32_t src = targets[t];
    dist[src] = 0;
    queue[tail++] = src;
    while (head < tail) {
      const int32_t c = queue[head++];
      const int cy = c / w, cx = c % w;
      const int32_t dc = dist[c];
      const int dys[] = {-1, 1, 0, 0}, dxs[] = {0, 0, -1, 1};
      for (int d = 0; d < 4; ++d) {
        const int ny = cy + dys[d], nx = cx + dxs[d];
        if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
        const int32_t ni = ny * w + nx;
        if (!passable[ni]) continue;
        if (dist[ni] > dc + 1) {
          dist[ni] = dc + 1;
          queue[tail++] = ni;
        }
      }
    }
  }
}

}  // extern "C"
