// Minimal ROS shim so the reference's header-only math (root_finder.hpp uses
// one ROS_ERROR) compiles standalone for the golden parity dump.  Not a ROS
// implementation — just enough to satisfy the includes.
#pragma once
#include <cstdio>
#include <iostream>  // root_finder.hpp uses std::cout without including it

#define ROS_ERROR(...) std::fprintf(stderr, __VA_ARGS__)
#define ROS_WARN(...) std::fprintf(stderr, __VA_ARGS__)
#define ROS_INFO(...) std::fprintf(stderr, __VA_ARGS__)
#define ROS_ERROR_STREAM(x)
#define ROS_WARN_STREAM(x)
#define ROS_INFO_STREAM(x)
