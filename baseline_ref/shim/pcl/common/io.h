#pragma once
#include <pcl/point_cloud.h>

namespace pcl {
template <typename PointInT, typename PointOutT>
void copyPointCloud(const PointCloud<PointInT>& in, PointCloud<PointOutT>& out) {
  out.header = in.header;
  out.resize(in.size());
  for (std::size_t i = 0; i < in.size(); ++i) {
    out.points[i].x = in.points[i].x;
    out.points[i].y = in.points[i].y;
    out.points[i].z = in.points[i].z;
  }
}
}  // namespace pcl
