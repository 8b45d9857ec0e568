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


// ---------------------------------------------------------------------------
// Mid-end full solve golden (VERDICT r3 item 4a): the reference's OriTraj
// cost (minco energy + rho*sum(T) + weightPR*sum(||pos_i - ref_i||^3), with
// its addPosePenalty gradT quirk reproduced verbatim, mid_end.hpp:256)
// optimized by the reference's own lbfgs on demo-1-like waypoints.
// forwardT/forwardP/backwardGradT are the header's diffeomorphisms
// (mid_end.hpp:91-160) restated here because OriTraj itself drags in ROS.
// ---------------------------------------------------------------------------

struct MidEndProblem {
  int N = 0, integralRes = 64;
  double rho = 200.0, weightPR = 1000.0;
  Eigen::Matrix3d head, tail;
  Eigen::Matrix3Xd ref_points;   // (3, N-1)
  minco::MINCO_S3NU mc;

  static void forwardT(const Eigen::VectorXd &tau, Eigen::VectorXd &T) {
    T.resize(tau.size());
    for (int i = 0; i < tau.size(); i++)
      T(i) = tau(i) > 0.0 ? ((0.5 * tau(i) + 1.0) * tau(i) + 1.0)
                          : 1.0 / ((0.5 * tau(i) - 1.0) * tau(i) + 1.0);
  }
  static void backwardT(const Eigen::VectorXd &T, Eigen::VectorXd &tau) {
    tau.resize(T.size());
    for (int i = 0; i < T.size(); i++)
      tau(i) = T(i) > 1.0 ? (std::sqrt(2.0 * T(i) - 1.0) - 1.0)
                          : (1.0 - std::sqrt(2.0 / T(i) - 1.0));
  }
  static void backwardGradT(const Eigen::VectorXd &tau,
                            const Eigen::VectorXd &gradT,
                            Eigen::VectorXd &gradTau) {
    gradTau.resize(tau.size());
    for (int i = 0; i < tau.size(); i++) {
      if (tau(i) > 0.0) {
        gradTau(i) = gradT(i) * (tau(i) + 1.0);
      } else {
        double den = (0.5 * tau(i) - 1.0) * tau(i) + 1.0;
        gradTau(i) = gradT(i) * (1.0 - tau(i)) / (den * den);
      }
    }
  }

  static double cost(void *ptr, const Eigen::VectorXd &x,
                     Eigen::VectorXd &g, double &p_cost) {
    (void)p_cost;
    MidEndProblem &obj = *(MidEndProblem *)ptr;
    const int N = obj.N;
    Eigen::Map<const Eigen::VectorXd> tau(x.data(), N);
    Eigen::Map<const Eigen::VectorXd> xi(x.data() + N, 3 * (N - 1));
    Eigen::VectorXd T;
    forwardT(tau, T);
    Eigen::Matrix3Xd P(3, N - 1);
    for (int i = 0; i < N - 1; i++) P.col(i) = xi.segment(3 * i, 3);

    obj.mc.setParameters(P, T);
    double cost = 0.0;
    obj.mc.getEnergy(cost);
    Eigen::MatrixX3d gdC(6 * N, 3);
    Eigen::VectorXd gdT(N);
    obj.mc.getEnergyPartialGradByCoeffs(gdC);
    obj.mc.getEnergyPartialGradByTimes(gdT);

    // addPosePenalty (mid_end.hpp:201-260), gradT quirk included
    const Eigen::MatrixX3d &coeffs = obj.mc.getCoeffs();
    const double alpha = 1.0 / obj.integralRes;
    for (int i = 0; i < N - 1; ++i) {
      int segment = i + 1;
      const auto &c = coeffs.block<6, 3>(segment * 6, 0);
      double s1 = alpha * T(segment);
      double s2 = s1 * s1, s3 = s2 * s1, s4 = s2 * s2, s5 = s4 * s1;
      Eigen::Matrix<double, 6, 1> beta0, beta1;
      beta0 << 1.0, s1, s2, s3, s4, s5;
      beta1 << 0.0, 1.0, 2.0 * s1, 3.0 * s2, 4.0 * s3, 5.0 * s4;
      Eigen::Vector3d pos = c.transpose() * beta0;
      Eigen::Vector3d vel = c.transpose() * beta1;
      Eigen::Vector3d diff = pos - obj.ref_points.col(i);
      double nrm = diff.norm();
      double cost_p = nrm * nrm * nrm;
      Eigen::Vector3d gradp = 3.0 * nrm * nrm * diff.normalized();
      if (cost_p + 0.0 > 0.0) {
        gdC.block<6, 3>(segment * 6, 0) +=
            obj.weightPR * (beta0 * gradp.transpose());
        gdT(segment) += obj.weightPR * (cost_p * (alpha * gradp.dot(vel)));
        cost += obj.weightPR * cost_p;
      }
    }

    Eigen::Matrix3Xd gradP(3, N - 1);
    Eigen::VectorXd gradT(N);
    obj.mc.propogateGrad(gdC, gdT, gradP, gradT);
    cost += obj.rho * T.sum();
    gradT.array() += obj.rho;
    Eigen::VectorXd gradTau;
    backwardGradT(tau, gradT, gradTau);
    g.resize(x.size());
    g.head(N) = gradTau;
    for (int i = 0; i < N - 1; i++)
      g.segment(N + 3 * i, 3) = gradP.col(i);
    return cost;
  }
};

void dumpMidEnd() {
  const int N = 5;
  MidEndProblem p;
  p.N = N;
  p.head = Eigen::Matrix3d::Zero();
  p.tail = Eigen::Matrix3d::Zero();
  p.tail(0, 0) = 8.0; p.tail(1, 0) = 3.0; p.tail(2, 0) = 2.0;
  p.ref_points.resize(3, N - 1);
  for (int i = 0; i < N - 1; ++i) {
    double f = double(i + 1) / N;
    p.ref_points(0, i) = 8.0 * f + 0.3 * det(3 * i);
    p.ref_points(1, i) = 3.0 * f + 0.3 * det(3 * i + 1);
    p.ref_points(2, i) = 2.0 * f + 0.3 * det(3 * i + 2);
  }
  p.mc.setConditions(p.head, p.tail, N);

  Eigen::VectorXd T0 = Eigen::VectorXd::Constant(N, 2.0);
  Eigen::VectorXd tau0;
  MidEndProblem::backwardT(T0, tau0);
  Eigen::VectorXd x(N + 3 * (N - 1));
  x.head(N) = tau0;
  for (int i = 0; i < N - 1; i++)
    x.segment(N + 3 * i, 3) = p.ref_points.col(i);
  Eigen::VectorXd x0 = x;

  double fx = 0.0;
  lbfgs::lbfgs_parameter_t par;
  par.mem_size = 16;
  par.past = 10;
  par.g_epsilon = 0.0;
  par.min_step = 1.0e-32;
  par.delta = 1.0e-6;
  par.max_iterations = 100000;
  int ret = lbfgs::lbfgs_optimize(x, fx, &MidEndProblem::cost, nullptr,
                                  nullptr, &p, par);

  Eigen::Map<const Eigen::VectorXd> tau(x.data(), N);
  Eigen::VectorXd T;
  MidEndProblem::forwardT(tau, T);
  Eigen::Matrix3Xd P(3, N - 1);
  for (int i = 0; i < N - 1; i++) P.col(i) = x.segment(N + 3 * i, 3);
  p.mc.setParameters(P, T);
  Trajectory<5> traj;
  p.mc.getTrajectory(traj);

  const int NT = 17;
  double ts[NT];
  std::vector<double> pos;
  double total = traj.getTotalDuration();
  for (int i = 0; i < NT; ++i) {
    ts[i] = total * i / (NT - 1);
    Eigen::Vector3d pp = traj.getPos(std::min(ts[i], total));
    for (int d = 0; d < 3; ++d) pos.push_back(pp(d));
  }

  beginObj("mid_end");
  writeScalar("N", N);
  writeScalar("integralRes", p.integralRes);
  writeScalar("rho", p.rho);
  writeScalar("weightPR", p.weightPR);
  writeMat("head", p.head);
  writeMat("tail", p.tail);
  writeMat("ref_points", Eigen::MatrixXd(p.ref_points));
  writeMat("T0", T0);
  writeMat("x0", x0);
  writeScalar("ret", ret);
  writeScalar("f_star", fx);
  writeMat("T_star", T);
  writeMat("points_star", Eigen::MatrixXd(P));
  writeMat("coeffs_star", p.mc.getCoeffs());
  writeArray("eval_ts", ts, NT);
  writeArray("eval_pos", pos.data(), (int)pos.size());
  writeScalar("total_duration", total);
  endObj();
}

// ---------------------------------------------------------------------------
// Back-end integral penalty cost+grad golden (VERDICT r3 item 4b): the
// reference's addTimeIntPenaltyParallel (back_end_optimizer.hpp:432-554)
// restated single-threaded on a FIXED trajectory — header math only
// (flatness optimizated_forward + backwardthreadsafe + smoothedL1).
// ---------------------------------------------------------------------------

static bool refSmoothedL1(const double &x, const double &mu, double &f,
                          double &df) {
  if (x < 0.0) { return false; }
  else if (x > mu) { f = x - 0.5 * mu; df = 1.0; return true; }
  else {
    const double xdmu = x / mu;
    const double sqrxdmu = xdmu * xdmu;
    const double mumxd2 = mu - 0.5 * x;
    f = mumxd2 * sqrxdmu * xdmu;
    df = sqrxdmu * ((-0.5) * xdmu + 3.0 * mumxd2 / mu);
    return true;
  }
}

void dumpBackendIntegral() {
  // fixed trajectory: same construction as dumpMincoS3
  const int N = 5;
  Eigen::Matrix3d head = Eigen::Matrix3d::Zero();
  Eigen::Matrix3d tail = Eigen::Matrix3d::Zero();
  head(0, 0) = 0.5; head(1, 0) = -0.25; head(2, 0) = 1.0;
  head(0, 1) = 0.3; head(1, 1) = 0.1;
  tail(0, 0) = 8.0; tail(1, 0) = 3.0; tail(2, 0) = 2.0;
  tail(2, 1) = -0.2;
  Eigen::Matrix3Xd q(3, N - 1);
  for (int i = 0; i < N - 1; ++i)
    for (int d = 0; d < 3; ++d)
      q(d, i) = 2.0 * (i + 1) * (d == 0) + det(3 * i + d);
  Eigen::VectorXd T(N);
  for (int i = 0; i < N; ++i) T(i) = 1.2 + 0.2 * (i % 3);
  minco::MINCO_S3NU mc;
  mc.setConditions(head, tail, N);
  mc.setParameters(q, T);
  const Eigen::MatrixX3d &coeffs = mc.getCoeffs();

  flatness::FlatnessMap fm;
  fm.reset(0.61, 9.8, 0.10, 0.10, 0.01, 1.0e-4);

  const double vmax = 2.0, omgmax = 2.5, thetamax = 0.9;
  const double weightVel = 100.0, weightOmg = 50.0, weightTheta = 75.0;
  const double smoothFactor = 1.0e-2;
  const int integralResolution = 16;
  const double integralFrac = 1.0 / integralResolution;
  const double velSqrMax = vmax * vmax, omgSqrMax = omgmax * omgmax;

  double cost = 0.0;
  Eigen::MatrixX3d gradC = Eigen::MatrixX3d::Zero(6 * N, 3);
  Eigen::VectorXd gradT = Eigen::VectorXd::Zero(N);

  for (int i = 0; i < N; ++i) {
    double step = T(i) * integralFrac;
    const Eigen::Matrix<double, 6, 3> &c = coeffs.block<6, 3>(i * 6, 0);
    for (int j = 0; j <= integralResolution; ++j) {
      double s1 = j * step;
      double s2 = s1 * s1, s3 = s2 * s1, s4 = s2 * s2, s5 = s4 * s1;
      Eigen::Matrix<double, 6, 1> beta0, beta1, beta2, beta3, beta4;
      beta0 << 1.0, s1, s2, s3, s4, s5;
      beta1 << 0.0, 1.0, 2.0 * s1, 3.0 * s2, 4.0 * s3, 5.0 * s4;
      beta2 << 0.0, 0.0, 2.0, 6.0 * s1, 12.0 * s2, 20.0 * s3;
      beta3 << 0.0, 0.0, 0.0, 6.0, 24.0 * s1, 60.0 * s2;
      beta4 << 0.0, 0.0, 0.0, 0.0, 24.0, 120.0 * s1;
      Eigen::Vector3d pos = c.transpose() * beta0;
      Eigen::Vector3d vel = c.transpose() * beta1;
      Eigen::Vector3d acc = c.transpose() * beta2;
      Eigen::Vector3d jer = c.transpose() * beta3;
      Eigen::Vector3d sna = c.transpose() * beta4;

      Eigen::Vector4d quat;
      Eigen::Vector3d omg;
      fm.optimizated_forward(vel, acc, jer, quat, omg);

      Eigen::Vector3d gradVel = Eigen::Vector3d::Zero();
      Eigen::Vector3d gradPos = Eigen::Vector3d::Zero();
      Eigen::Vector3d gradOmg = Eigen::Vector3d::Zero();
      Eigen::Vector4d gradQuat = Eigen::Vector4d::Zero();
      Eigen::Vector3d gradPosTotal = Eigen::Vector3d::Zero();
      Eigen::Vector3d gradVelTotal = Eigen::Vector3d::Zero();
      Eigen::Vector3d gradAccTotal = Eigen::Vector3d::Zero();
      Eigen::Vector3d gradJerTotal = Eigen::Vector3d::Zero();

      double pena = 0.0;
      double cos_theta =
          1.0 - 2.0 * (quat(1) * quat(1) + quat(2) * quat(2));
      double violaVel = vel.squaredNorm() - velSqrMax;
      double violaOmg = omg.squaredNorm() - omgSqrMax;
      double violaTheta = std::acos(cos_theta) - thetamax;
      double node = (j == 0 || j == integralResolution) ? 0.5 : 1.0;
      double alpha = j * integralFrac;

      double f = 0.0, df = 0.0;
      if (refSmoothedL1(violaVel, smoothFactor, f, df)) {
        gradVel += weightVel * df * 2.0 * vel;
        pena += weightVel * f;
      }
      if (refSmoothedL1(violaOmg, smoothFactor, f, df)) {
        gradOmg += weightOmg * df * 2.0 * omg;
        pena += weightOmg * f;
      }
      if (refSmoothedL1(violaTheta, smoothFactor, f, df)) {
        gradQuat += weightTheta * df /
                    std::sqrt(1.0 - cos_theta * cos_theta) * 4.0 *
                    Eigen::Vector4d(0.0, quat(1), quat(2), 0.0);
        pena += weightTheta * f;
      }
      fm.backwardthreadsafe(vel, acc, jer, gradPos, gradVel, gradQuat,
                            gradOmg, gradPosTotal, gradVelTotal,
                            gradAccTotal, gradJerTotal);
      gradC.block<6, 3>(i * 6, 0) +=
          (beta0 * gradPosTotal.transpose() +
           beta1 * gradVelTotal.transpose() +
           beta2 * gradAccTotal.transpose() +
           beta3 * gradJerTotal.transpose()) * node * step;
      gradT(i) += (gradPosTotal.dot(vel) + gradVelTotal.dot(acc) +
                   gradAccTotal.dot(jer) + gradJerTotal.dot(sna)) *
                      alpha * node * step +
                  node * integralFrac * pena;
      cost += node * step * pena;
    }
  }

  beginObj("backend_integral");
  writeScalar("N", N);
  writeScalar("integralRes", integralResolution);
  writeScalar("vmax", vmax);
  writeScalar("omgmax", omgmax);
  writeScalar("thetamax", thetamax);
  writeScalar("weight_v", weightVel);
  writeScalar("weight_omg", weightOmg);
  writeScalar("weight_theta", weightTheta);
  writeScalar("smooth_fac", smoothFactor);
  writeMat("T", T);
  writeMat("coeffs", coeffs);
  writeScalar("cost", cost);
  writeMat("grad_coeffs", gradC);
  writeMat("grad_times", gradT);
  endObj();
}

void dumpBackendSwept() {
  // Swept-SDF safety penalty + its hand-chained adjoints at frozen t*
  // (ref back_end_optimizer.hpp:557-649 addSaftyPenaOnSweptVolumeParallel +
  // grad_cost_p_sw hpp:827-866, incl. the gradT(j<i) accumulation).  The
  // body SDF is replaced by a fixed closed-form quadratic model
  //   sdf(p_rel) = s0 + g·p_rel + 0.5·p_relᵀA p_rel
  // evaluated consistently on both sides, so the piece under test is the
  // gradient CHAIN (flatness quat → rotate → p_rel → quat/pos adjoints →
  // backwardthreadsafe → gradC/gradT), not the sweep argmin (parity-tested
  // elsewhere).  ∂(Rᵀ)/∂q_k (ref getQuatTransDW/DX/DY/DZ, hpp:127-173) is
  // obtained by central differences of Eigen's quadratic quat→R map —
  // exact for a degree-2 polynomial, no reference code reproduced.
  const int N = 5;
  Eigen::Matrix3d head = Eigen::Matrix3d::Zero();
  Eigen::Matrix3d tail = Eigen::Matrix3d::Zero();
  head(0, 0) = 0.5; head(1, 0) = -0.25; head(2, 0) = 1.0;
  head(0, 1) = 0.3; head(1, 1) = 0.1;
  tail(0, 0) = 8.0; tail(1, 0) = 3.0; tail(2, 0) = 2.0;
  tail(2, 1) = -0.2;
  Eigen::Matrix3Xd q(3, N - 1);
  for (int i = 0; i < N - 1; ++i)
    for (int d = 0; d < 3; ++d)
      q(d, i) = 2.0 * (i + 1) * (d == 0) + det(3 * i + d);
  Eigen::VectorXd T(N);
  for (int i = 0; i < N; ++i) T(i) = 1.2 + 0.2 * (i % 3);
  minco::MINCO_S3NU mc;
  mc.setConditions(head, tail, N);
  mc.setParameters(q, T);
  const Eigen::MatrixX3d &coeffs = mc.getCoeffs();
  double totalT = T.sum();

  flatness::FlatnessMap fm;
  fm.reset(0.61, 9.8, 0.10, 0.10, 0.01, 1.0e-4);

  const double weightPos = 550.0, safety_hor = 2.0;
  // quadratic body-SDF model (fixed, both sides)
  Eigen::Vector3d g_lin(0.31, -0.22, 0.17);
  Eigen::Matrix3d A;
  A << 0.08, 0.02, -0.01,
       0.02, 0.05, 0.015,
      -0.01, 0.015, 0.06;
  const double s0 = 0.05;

  // K obstacle points with t* spread across ALL pieces (incl. interior),
  // none at a piece boundary
  const int K = 8;
  double fracs[K] = {0.06, 0.18, 0.33, 0.41, 0.55, 0.68, 0.81, 0.94};
  std::vector<double> pts(3 * K), tstars(K), sdfs(K), prels(3 * K);
  double cost = 0.0;
  Eigen::MatrixX3d gradC = Eigen::MatrixX3d::Zero(6 * N, 3);
  Eigen::VectorXd gradT = Eigen::VectorXd::Zero(N);

  for (int kpt = 0; kpt < K; ++kpt) {
    Eigen::Vector3d pos_eva;
    for (int d = 0; d < 3; ++d) {
      pos_eva(d) = 4.0 + 3.5 * det(100 + 3 * kpt + d);
      pts[3 * kpt + d] = pos_eva(d);
    }
    double t_star = fracs[kpt] * totalT;
    tstars[kpt] = t_star;
    // locate piece (ref Trajectory::locatePieceIdx semantics)
    int i = 0;
    double s1 = t_star;
    while (i < N - 1 && s1 > T(i)) { s1 -= T(i); ++i; }

    const Eigen::Matrix<double, 6, 3> &c = coeffs.block<6, 3>(i * 6, 0);
    double s2 = s1 * s1, s3 = s2 * s1, s4 = s2 * s2, s5 = s4 * s1;
    Eigen::Matrix<double, 6, 1> beta0, beta1, beta2, beta3, beta4;
    beta0 << 1.0, s1, s2, s3, s4, s5;
    beta1 << 0.0, 1.0, 2.0 * s1, 3.0 * s2, 4.0 * s3, 5.0 * s4;
    beta2 << 0.0, 0.0, 2.0, 6.0 * s1, 12.0 * s2, 20.0 * s3;
    beta3 << 0.0, 0.0, 0.0, 6.0, 24.0 * s1, 60.0 * s2;
    beta4 << 0.0, 0.0, 0.0, 0.0, 24.0, 120.0 * s1;
    Eigen::Vector3d pos = c.transpose() * beta0;
    Eigen::Vector3d vel = c.transpose() * beta1;
    Eigen::Vector3d acc = c.transpose() * beta2;
    Eigen::Vector3d jer = c.transpose() * beta3;
    Eigen::Vector3d sna = c.transpose() * beta4;

    Eigen::Vector4d quat;
    fm.optimizated_forward(vel, acc, jer, quat);
    Eigen::Matrix3d rotate =
        Eigen::Quaterniond(quat(0), quat(1), quat(2), quat(3))
            .toRotationMatrix();

    Eigen::Vector3d p_rel = rotate.transpose() * (pos_eva - pos);
    Eigen::Vector3d gradp_rel = g_lin + A * p_rel;
    double sdf_value =
        s0 + g_lin.dot(p_rel) + 0.5 * p_rel.dot(A * p_rel);
    sdfs[kpt] = sdf_value;
    for (int d = 0; d < 3; ++d) prels[3 * kpt + d] = p_rel(d);

    // grad_cost_p_sw (hpp:827): pos/quat adjoints of the penalty
    double sdf_cost = 0.0, sdf_out_grad = 0.0;
    Eigen::Vector3d gradPos = Eigen::Vector3d::Zero();
    Eigen::Vector4d gradQuat = Eigen::Vector4d::Zero();
    double pena = 0.0;
    if (refSmoothedL1(safety_hor - sdf_value, 0.01, sdf_cost,
                      sdf_out_grad)) {
      Eigen::Vector3d p_minus_x = pos_eva - pos;
      Eigen::Vector4d step_gradq;
      // ∂(Rᵀ)/∂q_k by central difference of the quadratic quat→R map
      for (int kq = 0; kq < 4; ++kq) {
        const double h = 1e-3;
        Eigen::Vector4d qp = quat, qm = quat;
        qp(kq) += h; qm(kq) -= h;
        Eigen::Matrix3d Rp =
            Eigen::Quaterniond(qp(0), qp(1), qp(2), qp(3))
                .toRotationMatrix();
        Eigen::Matrix3d Rm =
            Eigen::Quaterniond(qm(0), qm(1), qm(2), qm(3))
                .toRotationMatrix();
        Eigen::Matrix3d Dk = (Rp.transpose() - Rm.transpose()) / (2.0 * h);
        step_gradq(kq) = gradp_rel.transpose() * Dk * p_minus_x;
      }
      gradPos += weightPos * (sdf_out_grad * rotate * gradp_rel);
      gradQuat += weightPos * (-sdf_out_grad * step_gradq);
      pena += weightPos * sdf_cost;
    }
    Eigen::Vector3d gradVel = Eigen::Vector3d::Zero();
    Eigen::Vector3d gradOmg = Eigen::Vector3d::Zero();
    Eigen::Vector3d gradPosTotal = Eigen::Vector3d::Zero();
    Eigen::Vector3d gradVelTotal = Eigen::Vector3d::Zero();
    Eigen::Vector3d gradAccTotal = Eigen::Vector3d::Zero();
    Eigen::Vector3d gradJerTotal = Eigen::Vector3d::Zero();
    fm.backwardthreadsafe(vel, acc, jer, gradPos, gradVel, gradQuat,
                          gradOmg, gradPosTotal, gradVelTotal,
                          gradAccTotal, gradJerTotal);
    Eigen::Matrix<double, 6, 3> gdC =
        beta0 * gradPosTotal.transpose() + beta1 * gradVelTotal.transpose() +
        beta2 * gradAccTotal.transpose() + beta3 * gradJerTotal.transpose();
    double gdT = -gradPosTotal.dot(vel) - gradVelTotal.dot(acc) -
                 gradAccTotal.dot(jer) - gradJerTotal.dot(sna);
    cost += pena;
    gradC.block<6, 3>(i * 6, 0) += gdC;
    for (int j = 0; j < i; ++j) gradT(j) += gdT;
  }

  beginObj("backend_swept");
  writeScalar("N", N);
  writeScalar("weight_p", weightPos);
  writeScalar("safety_hor", safety_hor);
  writeScalar("s0", s0);
  writeArray("g_lin", g_lin.data(), 3);
  writeMat("A", A);
  writeMat("T", T);
  writeMat("coeffs", coeffs);
  writeArray("points", pts.data(), 3 * K);
  writeArray("tstars", tstars.data(), K);
  writeArray("sdf_values", sdfs.data(), K);
  writeArray("p_rels", prels.data(), 3 * K);
  writeScalar("cost", cost);
  writeMat("grad_coeffs", gradC);
  writeMat("grad_times", gradT);
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
  dumpMidEnd();
  dumpBackendIntegral();
  dumpBackendSwept();
  std::fprintf(out, "}\n");
  std::fclose(out);
  std::fprintf(stderr, "golden written to %s\n", path);
  return 0;
}
