// Whole-solve golden parity oracle: runs the reference's ACTUAL back end —
// TrajOptimizer::optimize_traj_lmbm (back_end_optimizer.cpp:99) over the
// real SweptVolumeManager argmin-t machinery (sw_manager.hpp:677,1000) and
// the prebuilt Fortran LMBM (utils/include/lmbm/lmbm.so) — on fixed
// scenarios, and dumps initial cost/gradient, final trajectory, final cost
// breakdown, and per-point swept-SDF values at the optimum to JSON.
//
// tests/test_parity_reference.py::TestBackendSolveParity consumes the dump:
// it re-evaluates the composed cost at the same x0 with isdf_tpu's jitted
// cost chain (tight tolerance — certifies the COMPOSITION of all the
// piece-parity-tested math), re-runs the full solve with isdf_tpu's
// optimizers (banded cost comparison), and re-evaluates the swept SDF on
// the reference's own optimized trajectory (argmin-machinery parity).
//
// The reference sources are included READ-ONLY; ROS/PCL-only surfaces
// (Visualization, debug_publisher, PCSmapManager) are shadowed by no-op
// stubs in ros_stub/ — none of them feeds back into the solve.  See
// ros_stub/*/*.h for the per-header justification.
#include <planner_algorithm/back_end_optimizer.hpp>

#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

namespace
{

    void fillConfig(Config &conf)
    {
        // config_CappedCone.yaml values (plan_manager/config), except:
        // threads_num 3 = 1.5x this host's 2 cores (the reference README:148
        // guidance), enableearlyExit off (debug pause loop), and the shape
        // OBJ set to the actual CappedCone (the shipped YAML points
        // CappedCone demos at RoundedCone.obj; the analytic-parity tests
        // on the Python side instantiate by shape name, so keep them equal).
        // RoundedCone + the YAML's 120° X-tilt — the shape config_CappedCone
        // .yaml actually loads.  NB CappedCone itself is unusable here: its
        // reference SDF is the compressed sqrt(d)/|b-a|² metric
        // (Shape.hpp:970-973), under which choiceTInit's inflated in-range
        // window (2·safety_hor+0.1, sw_manager.hpp:382) never closes along
        // the whole trajectory, so ranges never get pushed and the swept
        // penalty is identically zero — measured, not speculation.
        conf.threads_num = 3;
        conf.inputdata = "shapes/RoundedCone.obj";
        conf.poly_params = {0.0, 0.0, 0.0, 120.0, 0.0, 0.0};
        conf.use_objfile_as_body = true;
        conf.selfmapresu = 0.05;
        conf.enable_sweptvolume = true;
        conf.torlerance = 0.005;
        conf.momentum = 0.0;
        conf.eps = 0.05;
        conf.vehicleMass = 0.61;
        conf.gravAcc = 9.8;
        conf.horizDrag = 0.10;
        conf.vertDrag = 0.10;
        conf.parasDrag = 0.01;
        conf.speedEps = 0.0001;
        conf.occupancy_resolution = 1.0;
        conf.kernel_size = 13;
        conf.kernel_max_pitch = 45;
        conf.kernel_max_roll = 45;
        conf.kernel_ang_res = 9;
        conf.front_end_safeh = 0.0;
        conf.enableearlyExit = false;
        conf.debugpause = 1;
        conf.smoothingEps = 1.0e-2;
        conf.integralIntervs = 64;
        conf.relCostTol = 1.0e-16;
        conf.vmax = 10;
        conf.omgmax = 10;
        conf.thetamax = 100.0;
        conf.weight_v = 1000.0;
        conf.weight_a = 1000.0;
        conf.weight_p = 4000.0;
        conf.weight_pr = 1000.0;
        conf.weight_ar = 32000.0;
        conf.weight_omg = 1000.0;
        conf.weight_theta = 1000.0;
        conf.rho = 20;
        conf.safety_hor = 0.866;
        conf.inittime = 2.5;
        conf.mem_size = 16;
        conf.past = 10;
        conf.min_step = 1.0e-32;
        conf.g_epsilon = 0.0;
        conf.test_obs = {};
        conf.offsetAABBbox = {0.0, 0.0, 0.0};
    }

    struct Scenario
    {
        std::string name;
        Eigen::Matrix3d initS;  // cols: pos, vel, acc
        Eigen::Matrix3d finalS;
        std::vector<Eigen::Vector3d> Q;  // interior waypoints
        Eigen::VectorXd tau;             // unconstrained times (the Q,T
                                         // overload maps T raw into x: tau)
        std::vector<Eigen::Vector3d> points;  // obstacle points
    };

    // wall of obstacle points in the plane x=x0, y/z grid with a circular
    // gap of radius `gap_r` centred at (gy, gz)
    void addWall(std::vector<Eigen::Vector3d> &pts, double x0, double gy,
                 double gz, double gap_r, double y0, double y1, double z0,
                 double z1, double step)
    {
        for (double y = y0; y <= y1 + 1e-9; y += step)
            for (double z = z0; z <= z1 + 1e-9; z += step)
            {
                double dy = y - gy, dz = z - gz;
                if (std::sqrt(dy * dy + dz * dz) < gap_r)
                    continue;
                pts.emplace_back(x0, y, z);
            }
    }

    Scenario makeGap()
    {
        Scenario s;
        s.name = "gap";
        s.initS.setZero();
        s.finalS.setZero();
        s.initS.col(0) = Eigen::Vector3d(-8.0, 0.0, 5.0);
        s.finalS.col(0) = Eigen::Vector3d(8.0, 0.0, 5.0);
        s.Q = {Eigen::Vector3d(-4.0, 0.0, 5.0), Eigen::Vector3d(0.0, 0.0, 5.0),
               Eigen::Vector3d(4.0, 0.0, 5.0)};
        s.tau = Eigen::VectorXd::Ones(4);  // forwardT(1) = 2.5 s per piece
        addWall(s.points, 0.0, 0.0, 5.0, 4.0, -8.0, 8.0, 0.0, 11.0, 1.0);
        return s;
    }

    Scenario makeSlalom()
    {
        Scenario s;
        s.name = "slalom";
        s.initS.setZero();
        s.finalS.setZero();
        s.initS.col(0) = Eigen::Vector3d(-9.0, -2.5, 5.0);
        s.finalS.col(0) = Eigen::Vector3d(9.0, 2.5, 5.0);
        s.Q = {Eigen::Vector3d(-4.5, -1.2, 5.0), Eigen::Vector3d(0.0, 0.0, 5.0),
               Eigen::Vector3d(4.5, 1.2, 5.0)};
        s.tau = Eigen::VectorXd::Ones(4);
        addWall(s.points, -3.0, 2.5, 5.0, 4.2, -7.0, 7.0, 0.0, 10.0, 1.0);
        addWall(s.points, 3.0, -2.5, 5.0, 4.2, -7.0, 7.0, 0.0, 10.0, 1.0);
        return s;
    }

    // --- tiny JSON emitter ---------------------------------------------------
    void emitVec(FILE *f, const Eigen::VectorXd &v)
    {
        std::fprintf(f, "[");
        for (int i = 0; i < v.size(); ++i)
            std::fprintf(f, "%s%.17g", i ? ", " : "", v(i));
        std::fprintf(f, "]");
    }

    void emitPoints(FILE *f, const std::vector<Eigen::Vector3d> &pts)
    {
        std::fprintf(f, "[");
        for (size_t i = 0; i < pts.size(); ++i)
            std::fprintf(f, "%s[%.17g, %.17g, %.17g]", i ? ", " : "",
                         pts[i](0), pts[i](1), pts[i](2));
        std::fprintf(f, "]");
    }

    Eigen::VectorXd flatMat(const Eigen::MatrixXd &m)
    {
        Eigen::VectorXd out(m.size());
        int k = 0;
        for (int r = 0; r < m.rows(); ++r)
            for (int c = 0; c < m.cols(); ++c)
                out(k++) = m(r, c);
        return out;
    }

    // x = [tau | xi] for the final trajectory held in opt.times/opt.points
    Eigen::VectorXd finalX(TrajOptimizer &opt)
    {
        const int N = opt.pieceN;
        Eigen::VectorXd x(N + 3 * (N - 1));
        Eigen::VectorXd tau(N);
        TrajOptimizer::backwardT(opt.times, tau);
        x.head(N) = tau;
        for (int i = 0; i < N - 1; ++i)
            x.segment(N + 3 * i, 3) = opt.points.col(i);
        return x;
    }

    // sv/opt shared across scenarios (shape construction bakes the
    // self-kernels through the naive igl shim — do it once, like
    // plan_manager reuses one optimizer across plans)
    void runScenario(FILE *f, SweptVolumeManager::Ptr sv, TrajOptimizer &opt,
                     const Scenario &sc, bool last)
    {
        opt.parallel_points = sc.points;
        opt.parallel_points_num = static_cast<int>(sc.points.size());
        opt.lastTstar.assign(sc.points.size(), 0.0);

        const int N = static_cast<int>(sc.tau.size());
        const int n = N + 3 * (N - 1);

        // initial cost + gradient at x0 (composition certification point)
        opt.pieceN = N;
        opt.temporalDim = N;
        opt.spatialDim = 3 * (N - 1);
        opt.initState = sc.initS;
        opt.finalState = sc.finalS;
        opt.minco.setConditions(sc.initS, sc.finalS, N);
        Eigen::VectorXd x0(n);
        x0.head(N) = sc.tau;
        for (int i = 0; i < N - 1; ++i)
            x0.segment(N + 3 * i, 3) = sc.Q[i];
        Eigen::VectorXd g0(n);
        double f0 = TrajOptimizer::costFunctionLmbm(&opt, x0.data(), g0.data(), n);
        double f0_pos = opt.cost_pos;
        std::vector<double> tstar0 = opt.lastTstar;

        // full reference solve (the real entry point, back_end_optimizer.cpp:99)
        opt.lastTstar.assign(sc.points.size(), 0.0);
        Trajectory<TRAJ_ORDER> traj;
        ros::Time t0 = ros::Time::now();
        int ret = opt.optimize_traj_lmbm(sc.initS, sc.finalS, sc.Q, sc.tau, N, traj);
        double wall_ms = (ros::Time::now() - t0).toSec() * 1e3;

        // final cost breakdown: re-evaluate at the final x (set_ts=false in
        // the swept term means the re-eval is warm-start independent)
        Eigen::VectorXd xf = finalX(opt);
        Eigen::VectorXd gf(n);
        double ff = TrajOptimizer::costFunctionLmbm(&opt, xf.data(), gf.data(), n);
        double ff_pos = opt.cost_pos;

        // per-point swept SDF at the optimum (argmin-machinery parity data)
        sv->updateTraj(traj);
        std::vector<double> sdf_final(sc.points.size());
        for (size_t i = 0; i < sc.points.size(); ++i)
        {
            double ts = 0.0;
            Eigen::Vector3d gp;
            sdf_final[i] =
                sv->getSDFofSweptVolume<true>(sc.points[i], ts, gp, false);
        }

        // dense position sampling of the final trajectory
        double T_total = traj.getTotalDuration();
        int n_samp = 160;
        Eigen::VectorXd samples(3 * (n_samp + 1));
        for (int i = 0; i <= n_samp; ++i)
        {
            Eigen::Vector3d p = traj.getPos(T_total * i / n_samp);
            samples.segment(3 * i, 3) = p;
        }

        std::fprintf(f, "  \"%s\": {\n", sc.name.c_str());
        std::fprintf(f, "    \"ret\": %d,\n    \"wall_ms\": %.3f,\n", ret, wall_ms);
        std::fprintf(f, "    \"n_pieces\": %d,\n", N);
        std::fprintf(f, "    \"head\": ");
        emitVec(f, flatMat(sc.initS));
        std::fprintf(f, ",\n    \"tail\": ");
        emitVec(f, flatMat(sc.finalS));
        std::fprintf(f, ",\n    \"tau0\": ");
        emitVec(f, sc.tau);
        std::fprintf(f, ",\n    \"q0\": ");
        emitPoints(f, sc.Q);
        std::fprintf(f, ",\n    \"points\": ");
        emitPoints(f, sc.points);
        std::fprintf(f, ",\n    \"f0\": %.17g,\n    \"f0_pos\": %.17g,\n", f0, f0_pos);
        std::fprintf(f, "    \"g0\": ");
        emitVec(f, g0);
        std::fprintf(f, ",\n    \"tstar0\": ");
        emitVec(f, Eigen::Map<const Eigen::VectorXd>(tstar0.data(), tstar0.size()));
        std::fprintf(f, ",\n    \"iters\": %d,\n    \"evals\": %d,\n", opt.iter, opt.cost_iter);
        std::fprintf(f, "    \"final_cost\": %.17g,\n    \"final_cost_pos\": %.17g,\n", ff, ff_pos);
        std::fprintf(f, "    \"final_T\": ");
        emitVec(f, opt.times);
        std::fprintf(f, ",\n    \"final_q\": ");
        emitVec(f, flatMat(opt.points));
        std::fprintf(f, ",\n    \"total_duration\": %.17g,\n", T_total);
        std::fprintf(f, "    \"traj_samples\": ");
        emitVec(f, samples);
        std::fprintf(f, ",\n    \"sdf_final\": ");
        emitVec(f, Eigen::Map<const Eigen::VectorXd>(sdf_final.data(), sdf_final.size()));
        std::fprintf(f, ",\n    \"min_clearance\": %.17g\n",
                     *std::min_element(sdf_final.begin(), sdf_final.end()));
        std::fprintf(f, "  }%s\n", last ? "" : ",");
    }

}  // namespace

int main(int argc, char **argv)
{
    const char *out = argc > 1 ? argv[1] : "reference_solve_golden.json";
    FILE *f = std::fopen(out, "w");
    if (!f)
    {
        std::perror("fopen");
        return 1;
    }
    std::fprintf(f, "{\n");
    std::fprintf(f,
                 "  \"_comment\": \"whole-solve golden from the reference's "
                 "optimize_traj_lmbm + SweptVolumeManager + Fortran LMBM; "
                 "generated by native/parity/ref_solve.cpp\",\n");

    Config conf;
    fillConfig(conf);
    ros::NodeHandle nh;
    SweptVolumeManager::Ptr sv(new SweptVolumeManager(conf));
    sv->setMapKernel(nullptr, 0, 0, 0);  // dtor delete[]s it unconditionally
    sv->init(nh, conf);
    TrajOptimizer opt;
    opt.setParam(nh, conf);
    opt.setEnvironment(sv);
    opt.pcsmap_manager.reset(new PCSmapManager());

    runScenario(f, sv, opt, makeGap(), false);
    runScenario(f, sv, opt, makeSlalom(), true);
    std::fprintf(f, "}\n");
    std::fclose(f);
    std::printf("wrote %s\n", out);
    return 0;
}
