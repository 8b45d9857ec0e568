// Shadow stub for map_manager/PCSmap_manager.h (the real one needs PCL).
// The LMBM back-end path never touches the map manager: costFunctionLmbm's
// swept penalty iterates TrajOptimizer::parallel_points, which the harness
// fills directly (as plan_manager.cpp:246-254 would).  Only grad_cost_p —
// the non-swept L-BFGS map variant — calls getPointsInAABB, and it is not
// exercised by ref_solve.  aabb_points/getPointsInAABB exist solely so the
// reference sources still compile.
#pragma once
#include <Eigen/Core>
#include <map>
#include <sensor_msgs/PointCloud2.h>
#include <memory>
#include <vector>

class PCSmapManager
{
public:
    typedef std::shared_ptr<PCSmapManager> Ptr;
    std::map<int, Eigen::Vector3d> aabb_points;

    void getPointsInAABB(const Eigen::Vector3d &, double, double, double,
                         std::vector<Eigen::Vector3d> &) const {}
};
