// Native SE(3)-aware A* core — the host-side sequential hot loop of the
// front end, matching isdf_tpu/search/astar.py (the Python twin) and the
// reference's AstarPathSearcher semantics
// (ref front_end_Astar.hpp:171-187 heuristic, 197-238 expansion,
//  sw_manager.hpp:915 pose selection: zero pose first, else nearest to the
//  parent's pose).
//
// Exposed via a C ABI for ctypes; built by native/Makefile into
// libisdf_native.so.  The pose feasibility volume is precomputed on the TPU
// (one batched convolution) and passed in as a bit-per-pose byte tensor.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <queue>
#include <vector>
#include <limits>

namespace {

struct HeapItem {
  double f;
  int idx;
  bool operator<(const HeapItem& o) const { return f > o.f; }  // min-heap
};

inline double heuristic(int dx, int dy, int dz) {
  dx = std::abs(dx); dy = std::abs(dy); dz = std::abs(dz);
  int dmin = std::min(dx, std::min(dy, dz));
  int dmax = std::max(dx, std::max(dy, dz));
  int dmid = dx + dy + dz - dmin - dmax;
  const double s2 = 1.4142135623730951, s3 = 1.7320508075688772;
  return (s3 * dmin + s2 * (dmid - dmin) + (dmax - dmid)) * (1.0 + 1e-3);
}

}  // namespace

extern "C" {

// occ:   X*Y*Z bytes (1 = occupied)
// feas:  R*P*X*Y*Z bytes (1 = pose feasible) or nullptr for plain A*
// out_path: 3*max_len ints; out_poses: 2*max_len ints (roll idx, pitch idx)
// returns: path length (nodes), 0 on failure, -1 on bad input
int isdf_astar_se3(const uint8_t* occ, int X, int Y, int Z,
                   const uint8_t* feas, int R, int P,
                   int sx, int sy, int sz, int gx, int gy, int gz,
                   long max_expansions,
                   int* out_path, int* out_poses, int max_len,
                   long* out_expanded) {
  auto in_map = [&](int x, int y, int z) {
    return x >= 0 && x < X && y >= 0 && y < Y && z >= 0 && z < Z;
  };
  if (!in_map(sx, sy, sz) || !in_map(gx, gy, gz)) return -1;
  const long n = (long)X * Y * Z;
  auto vox = [&](int x, int y, int z) { return ((long)x * Y + y) * Z + z; };

  std::vector<double> gscore(n, std::numeric_limits<double>::infinity());
  std::vector<int> came(n, -1);
  std::vector<int16_t> pose_r(n, -1), pose_p(n, -1);
  std::vector<uint8_t> closed(n, 0);

  const bool pose_aware = feas != nullptr;
  const int zr = pose_aware ? (R - 1) / 2 : 0;
  const int zp = pose_aware ? (P - 1) / 2 : 0;

  auto choose_pose = [&](long v, int fr, int fp, int* cr, int* cp) -> bool {
    // zero pose first (ref visit_kernels_by_distance checks it before BFS)
    const uint8_t* base = feas;  // [R, P, X, Y, Z]
    if (base[((long)zr * P + zp) * n + v]) { *cr = zr; *cp = zp; return true; }
    int best = 1 << 29, bi = -1, bj = -1;
    for (int i = 0; i < R; i++) {
      for (int j = 0; j < P; j++) {
        if (!base[((long)i * P + j) * n + v]) continue;
        int d = std::abs(i - fr) + std::abs(j - fp);
        if (d < best) { best = d; bi = i; bj = j; }
      }
    }
    if (bi < 0) return false;
    *cr = bi; *cp = bj;
    return true;
  };

  long s = vox(sx, sy, sz), g = vox(gx, gy, gz);
  gscore[s] = 0.0;
  pose_r[s] = zr; pose_p[s] = zp;
  std::priority_queue<HeapItem> heap;
  heap.push({heuristic(sx - gx, sy - gy, sz - gz), (int)s});
  long expanded = 0;

  while (!heap.empty()) {
    long cur = heap.top().idx;
    heap.pop();
    if (closed[cur]) continue;
    closed[cur] = 1;
    expanded++;
    if (cur == g || expanded > max_expansions) break;
    int cx = cur / ((long)Y * Z), cy = (cur / Z) % Y, cz = cur % Z;
    double cg = gscore[cur];
    int fr = pose_r[cur], fp = pose_p[cur];
    for (int di = -1; di <= 1; di++)
      for (int dj = -1; dj <= 1; dj++)
        for (int dk = -1; dk <= 1; dk++) {
          if (!di && !dj && !dk) continue;
          int nx = cx + di, ny = cy + dj, nz = cz + dk;
          if (!in_map(nx, ny, nz)) continue;
          long nb = vox(nx, ny, nz);
          if (closed[nb] || occ[nb]) continue;
          int cr = 0, cp = 0;
          if (pose_aware && !choose_pose(nb, fr, fp, &cr, &cp)) continue;
          double ec = std::sqrt((double)(di * di + dj * dj + dk * dk));
          double ng = cg + ec;
          if (ng < gscore[nb]) {
            gscore[nb] = ng;
            came[nb] = (int)cur;
            pose_r[nb] = (int16_t)cr; pose_p[nb] = (int16_t)cp;
            heap.push({ng + heuristic(nx - gx, ny - gy, nz - gz), (int)nb});
          }
        }
  }
  if (out_expanded) *out_expanded = expanded;
  if (!closed[g]) return 0;

  // backtrack
  std::vector<long> chain;
  for (long v = g; v != -1; v = came[v]) {
    chain.push_back(v);
    if (v == s) break;
  }
  int L = (int)chain.size();
  if (L > max_len) return -2;
  for (int i = 0; i < L; i++) {
    long v = chain[L - 1 - i];
    out_path[3 * i + 0] = (int)(v / ((long)Y * Z));
    out_path[3 * i + 1] = (int)((v / Z) % Y);
    out_path[3 * i + 2] = (int)(v % Z);
    out_poses[2 * i + 0] = pose_r[v];
    out_poses[2 * i + 1] = pose_p[v];
  }
  return L;
}

}  // extern "C"
