// Minimal PCL point-type shim: just enough API surface to compile the
// reference FAST-LIO2 sources (laserMapping/preprocess/IMU_Processing/
// ikd-Tree/ivox3d) for CPU baseline timing.  Not a PCL reimplementation.
#pragma once
#include <cstdint>
#include <Eigen/Core>

namespace pcl {

struct PointXYZ {
  float x = 0.f, y = 0.f, z = 0.f, _pad = 1.f;
  PointXYZ() = default;
  PointXYZ(float px, float py, float pz) : x(px), y(py), z(pz) {}
  Eigen::Map<Eigen::Vector3f> getVector3fMap() {
    return Eigen::Map<Eigen::Vector3f>(&x);
  }
  Eigen::Map<const Eigen::Vector3f> getVector3fMap() const {
    return Eigen::Map<const Eigen::Vector3f>(&x);
  }
};

struct PointXYZI : public PointXYZ {
  float intensity = 0.f;
};

struct PointXYZINormal : public PointXYZ {
  float intensity = 0.f;
  float normal_x = 0.f, normal_y = 0.f, normal_z = 0.f;
  float curvature = 0.f;
};

struct PointXYZRGB : public PointXYZ {
  union {
    struct { std::uint8_t b, g, r, a; };
    float rgb;
    std::uint32_t rgba;
  };
  PointXYZRGB() : rgba(0) {}
};

}  // namespace pcl
