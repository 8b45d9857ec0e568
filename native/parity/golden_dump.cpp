// Golden parity dump: drives the REFERENCE implementation's header-only math
// (/root/reference/src/utils/include/utils/{minco,flatness,trajectory,lbfgs}.hpp)
// on fixed deterministic inputs and emits a JSON file of inputs + outputs.
// tests/test_parity_reference.py replays the same inputs through the JAX
// re-derivations and compares at f64 tolerances.
//
// This file is NEW driver code; the reference headers are included in place
// (read-only) exactly as a downstream user of that library would.
//
// Build: see native/Makefile target `parity` (g++ + the tensorflow-vendored
// Eigen headers + a minimal ros shim for root_finder.hpp's logging macro).

#include <cstdio>
#include <cmath>
#include <vector>

#include <Eigen/Eigen>

// lbfgs.hpp calls unqualified isinf/isnan (compiled against an older
// toolchain where the C globals leaked); surface the std:: versions.
using std::isinf;
using std::isnan;

#include <utils/trajectory.hpp>
#include <utils/minco.hpp>
#include <utils/flatness.hpp>
#include <utils/lbfgs.hpp>

namespace {

FILE *out = nullptr;
bool first_field = true;

void beginObj(const char *key) {
  std::fprintf(out, "%s\"%s\": {", first_field ? "" : ",\n", key);
  first_field = true;
}
void endObj() {
  std::fprintf(out, "}");
  first_field = false;
}
void writeScalar(const char *key, double v) {
  std::fprintf(out, "%s\"%s\": %.17g", first_field ? "" : ", ", key, v);
  first_field = false;
}
void writeArray(const char *key, const double *v, int n) {
  std::fprintf(out, "%s\"%s\": [", first_field ? "" : ", ", key);
  for (int i = 0; i < n; ++i)
    std::fprintf(out, "%s%.17g", i ? ", " : "", v[i]);
  std::fprintf(out, "]");
  first_field = false;
}
void writeMat(const char *key, const Eigen::MatrixXd &m) {
  // row-major flatten; the Python side reshapes
  std::vector<double> buf;
  buf.reserve(m.rows() * m.cols());
  for (int r = 0; r < m.rows(); ++r)
    for (int c = 0; c < m.cols(); ++c) buf.push_back(m(r, c));
  writeArray(key, buf.data(), (int)buf.size());
}

// deterministic pseudo-input stream (must stay in sync with the Python test)
double det(int i) { return std::sin(0.7 * i + 0.3) * (1.0 + 0.1 * (i % 7)); }

void dumpMincoS3() {
  const int N = 5;
  Eigen::Matrix3d head = Eigen::Matrix3d::Zero();
  Eigen::Matrix3d tail = Eigen::Matrix3d::Zero();
  head(0, 0) = 0.5; head(1, 0) = -0.25; head(2, 0) = 1.0;   // pos
  head(0, 1) = 0.3; head(1, 1) = 0.1;                        // vel
  tail(0, 0) = 8.0; tail(1, 0) = 3.0; tail(2, 0) = 2.0;
  tail(2, 1) = -0.2;
  Eigen::Matrix3Xd q(3, N - 1);
  for (int i = 0; i < N - 1; ++i)
    for (int d = 0; d < 3; ++d) q(d, i) = 2.0 * (i + 1) * (d == 0) + det(3 * i + d);
  Eigen::VectorXd T(N);
  for (int i = 0; i < N; ++i) T(i) = 1.2 + 0.2 * (i % 3);

  minco::MINCO_S3NU mc;
  mc.setConditions(head, tail, N);
  mc.setParameters(q, T);

  double energy = 0.0;
  mc.getEnergy(energy);
  Eigen::MatrixX3d gdC(6 * N, 3);
  Eigen::VectorXd gdT(N);
  mc.getEnergyPartialGradByCoeffs(gdC);
  mc.getEnergyPartialGradByTimes(gdT);

  // adjoint propagation with a fixed synthetic cost gradient
  Eigen::MatrixX3d costGradC(6 * N, 3);
  Eigen::VectorXd costGradT(N);
  for (int r = 0; r < 6 * N; ++r)
    for (int c = 0; c < 3; ++c) costGradC(r, c) = det(100 + 3 * r + c);
  for (int i = 0; i < N; ++i) costGradT(i) = det(400 + i);
  Eigen::Matrix3Xd gradP(3, N - 1);
  Eigen::VectorXd gradT_out(N);
  mc.propogateGrad(costGradC, costGradT, gradP, gradT_out);

  beginObj("minco_s3");
  writeScalar("N", N);
  writeMat("head", head);
  writeMat("tail", tail);
  writeMat("q", q);
  writeMat("T", T);
  writeMat("coeffs", mc.getCoeffs());
  writeScalar("energy", energy);
  writeMat("energy_grad_coeffs", gdC);
  writeMat("energy_grad_times", gdT);
  writeMat("cost_grad_coeffs", costGradC);
  writeMat("cost_grad_times", costGradT);
  writeMat("adj_grad_points", Eigen::MatrixXd(gradP));
  writeMat("adj_grad_times", gradT_out);

  // trajectory evaluation through Trajectory<5>
  Trajectory<5> traj;
  mc.getTrajectory(traj);
  const int NT = 9;
  double ts[NT];
  std::vector<double> pos, vel, acc, jer;
  double total = traj.getTotalDuration();
  for (int i = 0; i < NT; ++i) {
    ts[i] = total * (i + 0.5) / NT;
    Eigen::Vector3d p = traj.getPos(ts[i]), v = traj.getVel(ts[i]),
                    a = traj.getAcc(ts[i]), j = traj.getJer(ts[i]);
    for (int d = 0; d < 3; ++d) {
      pos.push_back(p(d)); vel.push_back(v(d));
      acc.push_back(a(d)); jer.push_back(j(d));
    }
  }
  writeArray("eval_ts", ts, NT);
  writeArray("eval_pos", pos.data(), (int)pos.size());
  writeArray("eval_vel", vel.data(), (int)vel.size());
  writeArray("eval_acc", acc.data(), (int)acc.size());
  writeArray("eval_jer", jer.data(), (int)jer.size());
  writeScalar("total_duration", total);
  writeScalar("max_vel_rate", traj.getMaxVelRate());
  writeScalar("max_acc_rate", traj.getMaxAccRate());
  endObj();
}

void dumpFlatness() {
  flatness::FlatnessMap fm;
  // the demo parameter set (config yamls: mass 0.61, g 9.8, drags 0.1/0.1,
  // parasitic 0.01, speed eps 1e-4)
  fm.reset(0.61, 9.8, 0.10, 0.10, 0.01, 1.0e-4);

  const int K = 6;
  std::vector<double> ins, thrs, quats, omgs, bwd;
  for (int k = 0; k < K; ++k) {
    Eigen::Vector3d vel(det(k * 11), det(k * 11 + 1), det(k * 11 + 2));
    Eigen::Vector3d acc(det(k * 11 + 3), det(k * 11 + 4), det(k * 11 + 5));
    Eigen::Vector3d jer(2 * det(k * 11 + 6), 2 * det(k * 11 + 7), 2 * det(k * 11 + 8));
    double psi = 0.0, dpsi = 0.0;  // zero-yaw map (the planner's usage)
    double thr;
    Eigen::Vector4d quat;
    Eigen::Vector3d omg;
    fm.forward(vel, acc, jer, psi, dpsi, thr, quat, omg);
    for (int d = 0; d < 3; ++d) { ins.push_back(vel(d)); }
    for (int d = 0; d < 3; ++d) { ins.push_back(acc(d)); }
    for (int d = 0; d < 3; ++d) { ins.push_back(jer(d)); }
    thrs.push_back(thr);
    for (int d = 0; d < 4; ++d) quats.push_back(quat(d));
    for (int d = 0; d < 3; ++d) omgs.push_back(omg(d));

    // hand-written reverse pass on fixed output cotangents
    Eigen::Vector3d gPos(det(k * 7 + 50), det(k * 7 + 51), det(k * 7 + 52));
    Eigen::Vector3d gVel(det(k * 7 + 53), det(k * 7 + 54), det(k * 7 + 55));
    Eigen::Vector4d gQuat(det(k * 9 + 70), det(k * 9 + 71), det(k * 9 + 72),
                          det(k * 9 + 73));
    Eigen::Vector3d gOmg(det(k * 9 + 74), det(k * 9 + 75), det(k * 9 + 76));
    Eigen::Vector3d tPos, tVel, tAcc, tJer;
    fm.backwardthreadsafe(vel, acc, jer, gPos, gVel, gQuat, gOmg,
                          tPos, tVel, tAcc, tJer);
    for (int d = 0; d < 3; ++d) bwd.push_back(tPos(d));
    for (int d = 0; d < 3; ++d) bwd.push_back(tVel(d));
    for (int d = 0; d < 3; ++d) bwd.push_back(tAcc(d));
    for (int d = 0; d < 3; ++d) bwd.push_back(tJer(d));
  }
  beginObj("flatness");
  writeScalar("K", K);
  writeArray("vaj", ins.data(), (int)ins.size());       // (K, 9) row-major
  writeArray("thrust", thrs.data(), (int)thrs.size());
  writeArray("quat", quats.data(), (int)quats.size());  // (K, 4)
  writeArray("omg", omgs.data(), (int)omgs.size());     // (K, 3)
  writeArray("backward_totals", bwd.data(), (int)bwd.size());  // (K, 12)
  endObj();
}

// strongly-convex anisotropic test problem with a unique minimizer, shared
// with the Python side: f = 0.5 Σ s_i x_i² + Σ log(1 + (x_i − c_i)²)
// + 0.25 Σ (x_{i+1} − x_i)²
struct ConvexProblem {
  int n;
  std::vector<double> s, c;
  static double cost(void *ptr, const Eigen::VectorXd &x, Eigen::VectorXd &g,
                     double &aux_cost) {
    aux_cost = 0.0;  // the reference's extra penalty-cost out-param
    ConvexProblem &p = *(ConvexProblem *)ptr;
    double f = 0.0;
    g.setZero();
    for (int i = 0; i < p.n; ++i) {
      f += 0.5 * p.s[i] * x(i) * x(i);
      g(i) += p.s[i] * x(i);
      double d = x(i) - p.c[i];
      f += std::log(1.0 + d * d);
      g(i) += 2.0 * d / (1.0 + d * d);
    }
    for (int i = 0; i + 1 < p.n; ++i) {
      double d = x(i + 1) - x(i);
      f += 0.25 * d * d;
      g(i + 1) += 0.5 * d;
      g(i) -= 0.5 * d;
    }
    return f;
  }
};

void dumpLbfgs() {
  ConvexProblem p;
  p.n = 12;
  for (int i = 0; i < p.n; ++i) {
    p.s.push_back(0.5 + (i % 5));
    p.c.push_back(det(500 + i));
  }
  Eigen::VectorXd x(p.n);
  for (int i = 0; i < p.n; ++i) x(i) = det(600 + i);
  Eigen::VectorXd x0 = x;
  double fx = 0.0;
  lbfgs::lbfgs_parameter_t par;
  par.mem_size = 8;
  par.g_epsilon = 1.0e-10;
  par.past = 3;
  par.delta = 1.0e-12;
  int ret = lbfgs::lbfgs_optimize(x, fx, &ConvexProblem::cost, nullptr,
                                  nullptr, &p, par);
  beginObj("lbfgs_convex");
  writeScalar("n", p.n);
  writeArray("scale", p.s.data(), p.n);
  writeArray("center", p.c.data(), p.n);
  writeMat("x0", x0);
  writeScalar("ret", ret);
  writeScalar("f_star", fx);
  writeMat("x_star", x);
  endObj();
}

}  // namespace

int main(int argc, char **argv) {
  const char *path = argc > 1 ? argv[1] : "reference_golden.json";
  out = std::fopen(path, "w");
  if (!out) return 1;
  std::fprintf(out, "{");
  first_field = true;
  dumpMincoS3();
  dumpFlatness();
  dumpLbfgs();
  std::fprintf(out, "}\n");
  std::fclose(out);
  std::fprintf(stderr, "golden written to %s\n", path);
  return 0;
}
