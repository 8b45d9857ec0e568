#pragma once
#include <vector>
namespace std_msgs
{
    struct Float32MultiArray
    {
        std::vector<double> data;
    };
}
