#pragma once
#include <string>
#include <vector>
namespace sensor_msgs
{
    struct PointCloud2
    {
        struct { std::string frame_id; } header;
        std::vector<unsigned char> data;
    };
}
