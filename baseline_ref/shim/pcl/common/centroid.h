#pragma once
#include <pcl/point_cloud.h>
#include <Eigen/Core>

namespace pcl {
template <typename PointT, typename Scalar>
unsigned compute3DCentroid(const PointCloud<PointT>& cloud,
                           Eigen::Matrix<Scalar, 4, 1>& centroid) {
  centroid.setZero();
  if (cloud.empty()) return 0;
  for (const auto& p : cloud.points) {
    centroid[0] += Scalar(p.x); centroid[1] += Scalar(p.y); centroid[2] += Scalar(p.z);
  }
  centroid /= Scalar(cloud.size());
  centroid[3] = Scalar(1);
  return unsigned(cloud.size());
}
}  // namespace pcl
