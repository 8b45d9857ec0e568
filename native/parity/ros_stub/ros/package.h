// Shim for ros::package::getPath — the reference resolves its shape OBJ
// files relative to the plan_manager package root (Shape.cpp:35).
#pragma once
#include <string>
namespace ros
{
    namespace package
    {
        inline std::string getPath(const std::string &)
        {
            return "/root/reference/src/plan_manager";
        }
    }
}
