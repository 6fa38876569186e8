// g++ compatibility shim for building the MSVC-targeted reference
// (std::powf is MSVC-only; map it to the C powf).
#pragma once
#include <cmath>
namespace std { using ::powf; }
// the single-thread render path references the never-defined RECORD debug
// macro (PathTracing.hpp:28/461, dead machinery per SURVEY quirk 12)
#define RECORD false
