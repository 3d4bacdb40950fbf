// Minimal pcl::PointCloud shim (see point_types.h).
#pragma once
#include <cstdint>
#include <memory>
#include <string>
#include <vector>
#include <Eigen/Core>
#include <Eigen/StdVector>

namespace pcl {

struct PCLHeader {
  std::uint32_t seq = 0;
  std::uint64_t stamp = 0;   // microseconds, like PCL
  std::string frame_id;
};

template <typename PointT>
class PointCloud {
 public:
  using Ptr = std::shared_ptr<PointCloud<PointT>>;
  using ConstPtr = std::shared_ptr<const PointCloud<PointT>>;
  using VectorType = std::vector<PointT, Eigen::aligned_allocator<PointT>>;
  using iterator = typename VectorType::iterator;
  using const_iterator = typename VectorType::const_iterator;

  PCLHeader header;
  VectorType points;
  std::uint32_t width = 0, height = 1;
  bool is_dense = true;

  PointCloud() = default;
  PointCloud(std::uint32_t w, std::uint32_t h) : width(w), height(h) {
    points.resize(std::size_t(w) * h);
  }

  std::size_t size() const { return points.size(); }
  bool empty() const { return points.empty(); }
  void clear() { points.clear(); width = 0; height = 1; }
  void reserve(std::size_t n) { points.reserve(n); }
  void resize(std::size_t n) { points.resize(n); width = std::uint32_t(n); height = 1; }
  void push_back(const PointT& p) { points.push_back(p); width = std::uint32_t(points.size()); height = 1; }
  PointT& operator[](std::size_t i) { return points[i]; }
  const PointT& operator[](std::size_t i) const { return points[i]; }
  PointT& back() { return points.back(); }
  const PointT& back() const { return points.back(); }
  PointT& front() { return points.front(); }
  const PointT& front() const { return points.front(); }
  iterator begin() { return points.begin(); }
  iterator end() { return points.end(); }
  const_iterator begin() const { return points.begin(); }
  const_iterator end() const { return points.end(); }
  PointCloud& operator+=(const PointCloud& rhs) {
    points.insert(points.end(), rhs.points.begin(), rhs.points.end());
    width = std::uint32_t(points.size()); height = 1;
    return *this;
  }
};

}  // namespace pcl
