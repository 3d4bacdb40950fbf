#pragma once
#include <string>
#include <pcl/point_cloud.h>

namespace pcl {
class PCDWriter {
 public:
  template <typename PointT>
  int writeBinary(const std::string&, const PointCloud<PointT>&) { return 0; }
};
}  // namespace pcl
