// Measures the REFERENCE implementation's swept-SDF inner-loop throughput on
// this host: per evaluation = Trajectory<5>::getPos_Vel_Acc_Jerk +
// flatness::optimizated_forward (tilt quaternion) + body rotation + analytic
// capped-cone SDF + finite-difference gradient (the reference stamps grads
// via central differences, dx = 5e-6 — Shape.hpp:32-88
// DEFINE_USEFUL_FUNCTION), OpenMP-parallel over query points with
// threads ≈ 1.5 × cores (README.md:148 guidance).
//
// This is the denominator for bench.py's `vs_baseline`: the unit matches the
// TPU bench's "swept SDF+grad evals/s" (one time-sample of the argmin scan).
// Output: one JSON line {"ref_evals_per_s": ..., "threads": ..., "cores": ...}

#include <chrono>
#include <cmath>
#include <cstdio>
#include <thread>
#include <vector>

#include <Eigen/Eigen>

using std::isinf;
using std::isnan;

#include <utils/trajectory.hpp>
#include <utils/minco.hpp>
#include <utils/flatness.hpp>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

double det(int i) { return std::sin(0.7 * i + 0.3) * (1.0 + 0.1 * (i % 7)); }

// capped cone, IQ closed form (same formula family as Shape.hpp's
// CappedCone/our shapes/primitives.py — the math is the spec)
inline double sdCappedCone(const Eigen::Vector3d &p, double h, double r1,
                           double r2) {
  Eigen::Vector2d q(std::sqrt(p.x() * p.x() + p.y() * p.y()), p.z());
  Eigen::Vector2d k1(r2, h), k2(r2 - r1, 2.0 * h);
  Eigen::Vector2d ca(q.x() - std::min(q.x(), (q.y() < 0.0) ? r1 : r2),
                     std::fabs(q.y()) - h);
  Eigen::Vector2d d = k1 - q;
  double t = std::min(std::max(d.dot(k2) / k2.squaredNorm(), 0.0), 1.0);
  Eigen::Vector2d cb = q - k1 + k2 * t;
  double s = (cb.x() < 0.0 && ca.y() < 0.0) ? -1.0 : 1.0;
  return s * std::sqrt(std::min(ca.squaredNorm(), cb.squaredNorm()));
}

}  // namespace

int main(int argc, char **argv) {
  const long M = argc > 1 ? atol(argv[1]) : 2000000;

  // trajectory identical to the golden dump's MINCO case
  const int N = 5;
  Eigen::Matrix3d head = Eigen::Matrix3d::Zero();
  Eigen::Matrix3d tail = Eigen::Matrix3d::Zero();
  head(0, 0) = 0.5; head(1, 0) = -0.25; head(2, 0) = 1.0;
  head(0, 1) = 0.3; head(1, 1) = 0.1;
  tail(0, 0) = 8.0; tail(1, 0) = 3.0; tail(2, 0) = 2.0; tail(2, 1) = -0.2;
  Eigen::Matrix3Xd q(3, N - 1);
  for (int i = 0; i < N - 1; ++i)
    for (int d = 0; d < 3; ++d)
      q(d, i) = 2.0 * (i + 1) * (d == 0) + det(3 * i + d);
  Eigen::VectorXd T(N);
  for (int i = 0; i < N; ++i) T(i) = 1.2 + 0.2 * (i % 3);
  minco::MINCO_S3NU mc;
  mc.setConditions(head, tail, N);
  mc.setParameters(q, T);
  Trajectory<5> traj;
  mc.getTrajectory(traj);
  const double total = traj.getTotalDuration();

  flatness::FlatnessMap fm;
  fm.reset(0.61, 9.8, 0.10, 0.10, 0.01, 1.0e-4);

  int cores = (int)std::thread::hardware_concurrency();
  int threads = cores + cores / 2;  // 1.5x, reference guidance
#ifdef _OPENMP
  omp_set_num_threads(threads);
#else
  threads = 1;
#endif

  const double dx = 5.0e-6;  // reference FD step (Shape.hpp:36)
  double sink = 0.0;
  auto t0 = std::chrono::steady_clock::now();
#ifdef _OPENMP
#pragma omp parallel for reduction(+ : sink) schedule(static)
#endif
  for (long i = 0; i < M; ++i) {
    double t = std::fmod(0.61803398875 * (double)i, 1.0) * total;
    Eigen::Vector3d pw(det(i % 997), det((i + 13) % 997), det((i + 29) % 997));
    Eigen::Vector3d pos, vel, acc, jer;
    traj.getPos_Vel_Acc_Jerk(t, pos, vel, acc, jer);
    Eigen::Vector4d quat;
    fm.optimizated_forward(vel, acc, jer, quat);
    Eigen::Quaterniond Q(quat(0), quat(1), quat(2), quat(3));
    Eigen::Matrix3d R = Q.toRotationMatrix();
    Eigen::Vector3d prel = R.transpose() * (pw - pos);
    double sdf = sdCappedCone(prel, 0.8, 0.6, 0.2);
    // reference-style central-difference gradient: 6 extra SDF evals
    Eigen::Vector3d grad;
    for (int a = 0; a < 3; ++a) {
      Eigen::Vector3d pp = prel, pm = prel;
      pp(a) += dx; pm(a) -= dx;
      grad(a) = (sdCappedCone(pp, 0.8, 0.6, 0.2) -
                 sdCappedCone(pm, 0.8, 0.6, 0.2)) / (2.0 * dx);
    }
    sink += sdf + 1e-9 * grad.sum();
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  std::printf(
      "{\"ref_evals_per_s\": %.0f, \"threads\": %d, \"cores\": %d, "
      "\"elapsed_s\": %.3f, \"n\": %ld, \"sink\": %.6g}\n",
      (double)M / secs, threads, cores, secs, M, sink);
  return 0;
}
