// Included by the reference sources but never instantiated/used.
#pragma once
#include <pcl/point_cloud.h>

namespace pcl {
template <typename PointT>
class KdTreeFLANN {};
}  // namespace pcl
