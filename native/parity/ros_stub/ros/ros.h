// Minimal ROS shim so the reference's headers compile standalone for the
// parity tools (golden_dump, ref_bench, ref_solve).  Not a ROS
// implementation — just enough surface for the includes: logging macros,
// NodeHandle/Publisher no-ops, and a monotonic ros::Time.
#pragma once
#include <cstdio>
#include <iostream>  // root_finder.hpp uses std::cout without including it
#include <string>
#include <chrono>

#define ROS_ERROR(...) std::fprintf(stderr, __VA_ARGS__)
#define ROS_WARN(...) std::fprintf(stderr, __VA_ARGS__)
#define ROS_INFO(...) std::fprintf(stderr, __VA_ARGS__)
#define ROS_ERROR_STREAM(x)
#define ROS_WARN_STREAM(x)
#define ROS_INFO_STREAM(x)

namespace ros
{
    struct Duration
    {
        double sec{0.0};
        double toSec() const { return sec; }
    };

    struct Time
    {
        double t{0.0};
        static Time now()
        {
            using clock = std::chrono::steady_clock;
            auto ns = std::chrono::duration_cast<std::chrono::nanoseconds>(
                          clock::now().time_since_epoch())
                          .count();
            return Time{static_cast<double>(ns) * 1e-9};
        }
        double toSec() const { return t; }
        Duration operator-(const Time &o) const { return Duration{t - o.t}; }
    };

    struct Publisher
    {
        template <class Msg>
        void publish(const Msg &) const {}
    };

    struct NodeHandle
    {
        NodeHandle() {}
        explicit NodeHandle(const std::string &) {}
        template <class Msg>
        Publisher advertise(const std::string &, int) { return Publisher{}; }
        template <class Msg>
        Publisher advertise(const std::string &, int, bool)
        {
            return Publisher{};
        }
        // the parity harness fills Config directly; params never resolve
        template <class T>
        bool getParam(const std::string &, T &) const { return false; }
        template <class T>
        bool param(const std::string &, T &out, const T &def) const
        {
            out = def;
            return false;
        }
    };

    inline void spinOnce() {}
}
