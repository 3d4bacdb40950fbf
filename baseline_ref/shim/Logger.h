// Logging shim replacing the reference's spdlog-backed Logger.h
// (sensor_driver/common_lib/logging/Logger.h) for the baseline build.
#pragma once
#include <cstdio>

#define LOG_DEBUG(...) do {} while (0)
#define LOG_INFO(...)  do {} while (0)
#define LOG_WARN(...)  do { fprintf(stderr, __VA_ARGS__); fprintf(stderr, "\n"); } while (0)
#define LOG_ERROR(...) do { fprintf(stderr, __VA_ARGS__); fprintf(stderr, "\n"); } while (0)
