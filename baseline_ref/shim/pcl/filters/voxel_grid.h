// Minimal pcl::VoxelGrid shim: centroid-per-voxel downsampling, matching
// PCL semantics (average of all points that fall in a voxel).  Hash-map
// based; performance is comparable to PCL's sort-based implementation.
#pragma once
#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <pcl/point_cloud.h>

namespace pcl {

template <typename PointT>
class VoxelGrid {
 public:
  void setLeafSize(float lx, float ly, float lz) { lx_ = lx; ly_ = ly; lz_ = lz; }
  void setInputCloud(const typename PointCloud<PointT>::Ptr& in) { input_ = in; }

  void filter(PointCloud<PointT>& out) {
    struct Acc { double x = 0, y = 0, z = 0, i = 0; std::uint32_t n = 0; };
    std::unordered_map<std::uint64_t, Acc> grid;
    if (!input_) { out.clear(); return; }
    grid.reserve(input_->size());
    const double ilx = 1.0 / lx_, ily = 1.0 / ly_, ilz = 1.0 / lz_;
    for (const auto& p : input_->points) {
      if (!std::isfinite(p.x) || !std::isfinite(p.y) || !std::isfinite(p.z))
        continue;
      const std::int64_t gx = std::int64_t(std::floor(p.x * ilx));
      const std::int64_t gy = std::int64_t(std::floor(p.y * ily));
      const std::int64_t gz = std::int64_t(std::floor(p.z * ilz));
      const std::uint64_t key = (std::uint64_t(gx & 0x1FFFFF) << 42) |
                                (std::uint64_t(gy & 0x1FFFFF) << 21) |
                                std::uint64_t(gz & 0x1FFFFF);
      Acc& a = grid[key];
      a.x += p.x; a.y += p.y; a.z += p.z; a.i += intensity_of(p); a.n++;
    }
    PointCloud<PointT> result;
    result.header = input_->header;
    result.reserve(grid.size());
    for (const auto& kv : grid) {
      PointT p{};
      const Acc& a = kv.second;
      p.x = float(a.x / a.n); p.y = float(a.y / a.n); p.z = float(a.z / a.n);
      set_intensity(p, float(a.i / a.n));
      result.push_back(p);
    }
    out = std::move(result);
  }

 private:
  template <typename Q> static auto intensity_of(const Q& p) -> decltype(p.intensity) { return p.intensity; }
  static float intensity_of(...) { return 0.f; }
  template <typename Q> static auto set_intensity(Q& p, float v) -> decltype(p.intensity, void()) { p.intensity = v; }
  static void set_intensity(...) {}

  typename PointCloud<PointT>::Ptr input_;
  float lx_ = 0.1f, ly_ = 0.1f, lz_ = 0.1f;
};

}  // namespace pcl
