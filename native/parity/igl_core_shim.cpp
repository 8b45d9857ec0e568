// Minimal stand-ins for the libigl-core symbols the reference's Shape.cpp
// links against.  The reference ships igl HEADERS in IGL_STATIC_LIBRARY mode
// (Shape.hpp:3) but not the core archive, so these five instantiations are
// unresolved.  For the parity harness they are only exercised at SHAPE
// CONSTRUCTION time (OBJ load + self-kernel bake, Shape.cpp:27-105) and for
// mesh-backed Generalshape queries — never in the analytic-shape solve loop —
// so simple exact O(#F) implementations are used instead of BVH-accelerated
// ones: the winding number is the exact van Oosterom–Strackee solid-angle
// sum (the "fast" variant approximates it; sign is all the caller uses,
// Shape.cpp:110-118), and squared_distance scans all triangles with the
// standard closest-point-on-triangle case analysis.  Original code — nothing
// here is derived from libigl sources.
#define IGL_STATIC_LIBRARY 1
#include <igl/AABB.h>
#include <igl/fast_winding_number.h>
#include <igl/read_triangle_mesh.h>

#include <cmath>
#include <cstdio>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

namespace
{

    // closest point on triangle (a, b, c) to p — Voronoi-region case analysis
    inline Eigen::RowVector3d closestOnTri(const Eigen::RowVector3d &p,
                                           const Eigen::RowVector3d &a,
                                           const Eigen::RowVector3d &b,
                                           const Eigen::RowVector3d &c)
    {
        const Eigen::RowVector3d ab = b - a, ac = c - a, ap = p - a;
        const double d1 = ab.dot(ap), d2 = ac.dot(ap);
        if (d1 <= 0.0 && d2 <= 0.0)
            return a;
        const Eigen::RowVector3d bp = p - b;
        const double d3 = ab.dot(bp), d4 = ac.dot(bp);
        if (d3 >= 0.0 && d4 <= d3)
            return b;
        const double vc = d1 * d4 - d3 * d2;
        if (vc <= 0.0 && d1 >= 0.0 && d3 <= 0.0)
            return a + (d1 / (d1 - d3)) * ab;
        const Eigen::RowVector3d cp = p - c;
        const double d5 = ab.dot(cp), d6 = ac.dot(cp);
        if (d6 >= 0.0 && d5 <= d6)
            return c;
        const double vb = d5 * d2 - d1 * d6;
        if (vb <= 0.0 && d2 >= 0.0 && d6 <= 0.0)
            return a + (d2 / (d2 - d6)) * ac;
        const double va = d3 * d6 - d5 * d4;
        if (va <= 0.0 && (d4 - d3) >= 0.0 && (d5 - d6) >= 0.0)
            return b + ((d4 - d3) / ((d4 - d3) + (d5 - d6))) * (c - b);
        const double denom = 1.0 / (va + vb + vc);
        return a + (vb * denom) * ab + (vc * denom) * ac;
    }

}  // namespace

namespace igl
{

    // ---- read_triangle_mesh: plain OBJ (v/f lines; f may be a, a/b, a/b/c)
    template <>
    bool read_triangle_mesh<Eigen::MatrixXd, Eigen::MatrixXi>(
        const std::string str, Eigen::PlainObjectBase<Eigen::MatrixXd> &V,
        Eigen::PlainObjectBase<Eigen::MatrixXi> &F)
    {
        std::ifstream in(str);
        if (!in)
        {
            std::fprintf(stderr, "read_triangle_mesh shim: cannot open %s\n",
                         str.c_str());
            return false;
        }
        std::vector<Eigen::RowVector3d> vs;
        std::vector<Eigen::RowVector3i> fs;
        std::string line;
        while (std::getline(in, line))
        {
            std::istringstream ls(line);
            std::string tag;
            ls >> tag;
            if (tag == "v")
            {
                double x, y, z;
                ls >> x >> y >> z;
                vs.emplace_back(x, y, z);
            }
            else if (tag == "f")
            {
                std::vector<int> idx;
                std::string tok;
                while (ls >> tok)
                    idx.push_back(std::atoi(tok.c_str()) - 1);  // 1-indexed
                for (size_t k = 2; k < idx.size(); ++k)          // fan
                    fs.emplace_back(idx[0], idx[k - 1], idx[k]);
            }
        }
        V.resize(vs.size(), 3);
        for (size_t i = 0; i < vs.size(); ++i)
            V.row(i) = vs[i];
        F.resize(fs.size(), 3);
        for (size_t i = 0; i < fs.size(); ++i)
            F.row(i) = fs[i];
        return true;
    }

    // ---- AABB: the exhaustive squared_distance below never walks a tree,
    // so init has nothing to build (members default to the empty state)
    template <>
    template <>
    void AABB<Eigen::MatrixXd, 3>::init<Eigen::MatrixXi>(
        const Eigen::MatrixBase<Eigen::MatrixXd> &,
        const Eigen::MatrixBase<Eigen::MatrixXi> &)
    {
    }

    template <>
    template <>
    double AABB<Eigen::MatrixXd, 3>::squared_distance<Eigen::MatrixXi>(
        const Eigen::MatrixBase<Eigen::MatrixXd> &V,
        const Eigen::MatrixBase<Eigen::MatrixXi> &Ele,
        const Eigen::Matrix<double, 1, 3> &p, int &i,
        Eigen::PlainObjectBase<Eigen::Matrix<double, 1, 3>> &c) const
    {
        double best = std::numeric_limits<double>::infinity();
        i = -1;
        for (int f = 0; f < Ele.rows(); ++f)
        {
            const Eigen::RowVector3d q = closestOnTri(
                p, V.row(Ele(f, 0)), V.row(Ele(f, 1)), V.row(Ele(f, 2)));
            const double d2 = (q - p).squaredNorm();
            if (d2 < best)
            {
                best = d2;
                i = f;
                c = q;
            }
        }
        return best;
    }

    // ---- fast_winding_number precompute: stash the soup in the BVH struct's
    // own U/F storage (declared exactly for this purpose, fast_winding_number
    // .h:149-154); no acceleration structure is needed for the exact query
    template <>
    void fast_winding_number<Eigen::MatrixXd, Eigen::MatrixXi>(
        const Eigen::MatrixBase<Eigen::MatrixXd> &V,
        const Eigen::MatrixBase<Eigen::MatrixXi> &F, const int,
        FastWindingNumberBVH &fwn_bvh)
    {
        fwn_bvh.U.resize(V.rows());
        for (int i = 0; i < V.rows(); ++i)
        {
            fwn_bvh.U[i].vec[0] = static_cast<float>(V(i, 0));
            fwn_bvh.U[i].vec[1] = static_cast<float>(V(i, 1));
            fwn_bvh.U[i].vec[2] = static_cast<float>(V(i, 2));
        }
        fwn_bvh.F.resize(F.rows() * 3);
        for (int f = 0; f < F.rows(); ++f)
            for (int k = 0; k < 3; ++k)
                fwn_bvh.F[3 * f + k] = F(f, k);
    }

    // ---- exact winding number: van Oosterom–Strackee signed solid angle
    // summed over the soup, w = Σ Ω / 4π
    template <>
    void fast_winding_number<Eigen::Matrix<double, 1, 3>, Eigen::VectorXd>(
        const FastWindingNumberBVH &fwn_bvh, const float,
        const Eigen::MatrixBase<Eigen::Matrix<double, 1, 3>> &Q,
        Eigen::PlainObjectBase<Eigen::VectorXd> &W)
    {
        W.resize(1);
        const double px = Q(0, 0), py = Q(0, 1), pz = Q(0, 2);
        double omega = 0.0;
        const size_t nf = fwn_bvh.F.size() / 3;
        for (size_t f = 0; f < nf; ++f)
        {
            const auto &va = fwn_bvh.U[fwn_bvh.F[3 * f + 0]];
            const auto &vb = fwn_bvh.U[fwn_bvh.F[3 * f + 1]];
            const auto &vc = fwn_bvh.U[fwn_bvh.F[3 * f + 2]];
            const Eigen::Vector3d a(va.vec[0] - px, va.vec[1] - py, va.vec[2] - pz);
            const Eigen::Vector3d b(vb.vec[0] - px, vb.vec[1] - py, vb.vec[2] - pz);
            const Eigen::Vector3d cc(vc.vec[0] - px, vc.vec[1] - py, vc.vec[2] - pz);
            const double la = a.norm(), lb = b.norm(), lc = cc.norm();
            const double det = a.dot(b.cross(cc));
            const double den = la * lb * lc + a.dot(b) * lc + b.dot(cc) * la +
                               cc.dot(a) * lb;
            omega += 2.0 * std::atan2(det, den);
        }
        W(0) = omega / (4.0 * M_PI);
    }

}  // namespace igl
