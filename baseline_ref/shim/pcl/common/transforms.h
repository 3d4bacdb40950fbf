#pragma once
#include <pcl/point_cloud.h>
#include <Eigen/Geometry>

namespace pcl {
template <typename PointT, typename Scalar>
void transformPointCloud(const PointCloud<PointT>& in, PointCloud<PointT>& out,
                         const Eigen::Matrix<Scalar, 4, 4>& T) {
  if (&out != &in) { out = in; }
  for (auto& p : out.points) {
    Eigen::Matrix<Scalar, 4, 1> v(p.x, p.y, p.z, Scalar(1));
    v = T * v;
    p.x = float(v[0]); p.y = float(v[1]); p.z = float(v[2]);
  }
}
template <typename PointT, typename Scalar>
void transformPointCloud(const PointCloud<PointT>& in, PointCloud<PointT>& out,
                         const Eigen::Transform<Scalar, 3, Eigen::Affine>& T) {
  transformPointCloud(in, out, T.matrix());
}
}  // namespace pcl
