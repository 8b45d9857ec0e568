// Shadow stub for the reference's utils/Visualization.hpp (which needs PCL +
// full ROS message generation).  Visualization is display-only — nothing on
// the optimize_traj_lmbm path reads anything back from it — so every method
// is a variadic no-op.  Shadows the real header via include-path ordering;
// all other utils/* headers resolve to the real reference copies.
#pragma once
#include <ros/ros.h>
#include <memory>

namespace vis
{
    enum Color
    {
        white = 0,
        red,
        green,
        blue,
        yellow,
        orange,
        purple,
        pink,
        black,
        gray,
        steelblue,
        lightyellow,
        vis_gray
    };

    class Visualization
    {
    public:
        typedef std::shared_ptr<Visualization> Ptr;
        Visualization() {}
        explicit Visualization(ros::NodeHandle &) {}

        template <class... A> void visMesh(A &&...) {}
        template <class... A> void visPolytope(A &&...) {}
        template <class... A> void visABoxWithId(A &&...) {}
        template <class... A> void visABall(A &&...) {}
        template <class... A> void visBalls(A &&...) {}
        template <class... A> void visTraj(A &&...) {}
        template <class... A> void visPointcloudByVector(A &&...) {}
        template <class... A> void visPointCloud(A &&...) {}
        template <class... A> void visR3Path(A &&...) {}
        template <class... A> void visSE3Path(A &&...) {}
        template <class... A> void visSE3Vec(A &&...) {}
        template <class... A> void visVec(A &&...) {}
        template <class... A> void visLine(A &&...) {}
        template <class... A> void visArrow(A &&...) {}
        template <class... A> void visText(A &&...) {}
        template <class... A> void clear(A &&...) {}
    };
}

using vis::Visualization;
