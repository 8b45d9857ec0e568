// Shadow stub for utils/debug_publisher.hpp — the optimizer only pushes
// debug traces outward through it; nothing flows back into the solve.
#pragma once
#include <string>
#include <vector>
#include <ros/ros.h>

namespace debug_publisher
{
    inline void init(ros::NodeHandle &) {}
    inline void DBSendNew(const std::string &, const std::string &) {}
    inline void DBSendOptiStep(const std::vector<double> &) {}
    inline void DBSendLogCost(const std::vector<double> &) {}
}
