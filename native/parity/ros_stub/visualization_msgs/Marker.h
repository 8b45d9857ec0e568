#pragma once
#include <string>
#include <vector>
namespace visualization_msgs
{
    struct Marker
    {
        enum { ARROW = 0, CUBE = 1, SPHERE = 2, CYLINDER = 3,
               LINE_STRIP = 4, LINE_LIST = 5, TRIANGLE_LIST = 11 };
        enum { ADD = 0, MODIFY = 0, DELETE = 2, DELETEALL = 3 };
        struct { std::string frame_id; } header;
        int id{0};
        int type{0};
        int action{0};
    };
    struct MarkerArray
    {
        std::vector<Marker> markers;
    };
}
