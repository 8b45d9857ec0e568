// Isosurface extraction by marching tetrahedra — the native mesh-extraction
// core for swept-volume visualization (the role igl::marching_cubes plays in
// the reference's sw_calculate, ref sw_calculate.hpp:108-129).  Written from
// scratch: each grid cell splits into 6 tetrahedra; each tetrahedron emits
// 0-2 triangles by linear interpolation of the scalar field along its edges.
// Table-free, watertight on shared faces, C ABI for ctypes.

#include <cstdint>
#include <cmath>
#include <vector>

namespace {

struct V3 { double x, y, z; };

inline V3 lerp(const V3& a, const V3& b, double va, double vb, double iso) {
  double t = (iso - va) / (vb - va);
  if (t < 0) t = 0; if (t > 1) t = 1;
  return {a.x + t * (b.x - a.x), a.y + t * (b.y - a.y), a.z + t * (b.z - a.z)};
}

// 6-tetrahedra decomposition of the unit cube (corner indices 0..7 with
// corner c = (x + (c&1), y + ((c>>1)&1), z + ((c>>2)&1)))
const int TETS[6][4] = {
  {0, 5, 1, 6}, {0, 1, 3, 6}, {0, 3, 2, 6},
  {0, 2, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6},
};

void emit_tet(const V3 p[4], const double v[4], double iso,
              std::vector<double>& tris) {
  int inside = 0, idx[4];
  for (int i = 0; i < 4; i++) if (v[i] < iso) inside |= (1 << i);
  if (inside == 0 || inside == 15) return;

  auto push = [&](const V3& a, const V3& b, const V3& c) {
    tris.push_back(a.x); tris.push_back(a.y); tris.push_back(a.z);
    tris.push_back(b.x); tris.push_back(b.y); tris.push_back(b.z);
    tris.push_back(c.x); tris.push_back(c.y); tris.push_back(c.z);
  };

  // collect the 1-or-2-triangle cases by separating inside/outside vertices
  int in[4], out[4], ni = 0, no = 0;
  for (int i = 0; i < 4; i++) {
    if (v[i] < iso) in[ni++] = i; else out[no++] = i;
  }
  if (ni == 1) {
    V3 a = lerp(p[in[0]], p[out[0]], v[in[0]], v[out[0]], iso);
    V3 b = lerp(p[in[0]], p[out[1]], v[in[0]], v[out[1]], iso);
    V3 c = lerp(p[in[0]], p[out[2]], v[in[0]], v[out[2]], iso);
    push(a, b, c);
  } else if (ni == 3) {
    V3 a = lerp(p[out[0]], p[in[0]], v[out[0]], v[in[0]], iso);
    V3 b = lerp(p[out[0]], p[in[1]], v[out[0]], v[in[1]], iso);
    V3 c = lerp(p[out[0]], p[in[2]], v[out[0]], v[in[2]], iso);
    push(a, c, b);
  } else {  // ni == 2: quad -> 2 triangles
    V3 a = lerp(p[in[0]], p[out[0]], v[in[0]], v[out[0]], iso);
    V3 b = lerp(p[in[0]], p[out[1]], v[in[0]], v[out[1]], iso);
    V3 c = lerp(p[in[1]], p[out[1]], v[in[1]], v[out[1]], iso);
    V3 d = lerp(p[in[1]], p[out[0]], v[in[1]], v[out[0]], iso);
    push(a, b, c);
    push(a, c, d);
  }
}

}  // namespace

extern "C" {

// field: X*Y*Z doubles (x-major); origin/res define world coords.
// Returns number of triangles written (each 9 doubles) into out_tris
// (capacity max_tris), or -1 if capacity exceeded.
long isdf_marching_tetrahedra(const double* field, int X, int Y, int Z,
                              double ox, double oy, double oz, double res,
                              double iso, double* out_tris, long max_tris) {
  std::vector<double> tris;
  tris.reserve(1 << 16);
  auto F = [&](int x, int y, int z) {
    return field[((long)x * Y + y) * Z + z];
  };
  for (int x = 0; x < X - 1; x++)
    for (int y = 0; y < Y - 1; y++)
      for (int z = 0; z < Z - 1; z++) {
        double vals[8];
        V3 pos[8];
        bool lo = false, hi = false;
        for (int c = 0; c < 8; c++) {
          int cx = x + (c & 1), cy = y + ((c >> 1) & 1), cz = z + ((c >> 2) & 1);
          vals[c] = F(cx, cy, cz);
          pos[c] = {ox + cx * res, oy + cy * res, oz + cz * res};
          if (vals[c] < iso) lo = true; else hi = true;
        }
        if (!lo || !hi) continue;
        for (const auto& tet : TETS) {
          V3 tp[4];
          double tv[4];
          for (int i = 0; i < 4; i++) { tp[i] = pos[tet[i]]; tv[i] = vals[tet[i]]; }
          emit_tet(tp, tv, iso, tris);
        }
      }
  long ntri = (long)tris.size() / 9;
  if (ntri > max_tris) return -1;
  for (long i = 0; i < (long)tris.size(); i++) out_tris[i] = tris[i];
  return ntri;
}

}  // extern "C"
