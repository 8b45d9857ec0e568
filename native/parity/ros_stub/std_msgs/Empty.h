#pragma once
namespace std_msgs { struct Empty {}; }
