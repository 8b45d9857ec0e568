#pragma once
namespace std_msgs { struct Int16 { short data{0}; }; }
