// Baseline driver: feeds a recorded scan+IMU replay file through the
// REFERENCE FAST-LIO2 implementation (compiled unmodified from
// /root/reference/slam/mapping/fastlio/) and reports per-scan wall time.
//
// Replay file format (written by lsd_tpu/tools/export_replay.py):
//   magic   8 bytes  "LSDR1\0\0\0"
//   uint32  n_scans
//   per scan:
//     uint64 stamp_us
//     uint32 n_imu
//       n_imu * 7 doubles: t_abs_sec, gx, gy, gz (rad/s), ax, ay, az (m/s^2)
//     uint32 n_points
//       n_points * (4 float32: x y z intensity, 1 uint32: rel_stamp_us)
#include <chrono>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include <Eigen/Dense>
#include "mapping_types.h"

// entry points exported by the reference laserMapping.cpp
int fastlio_init(std::vector<double>& extT, std::vector<double>& extR,
                 int filter_num, int max_point_num, double scan_period,
                 bool undistort);
void fastlio_pcl_enqueue(PointCloudAttrPtr& points);
void fastlio_imu_enqueue(ImuType imu);
bool fastlio_main();
void fastlio_odometry(Eigen::Matrix4d& odom_s, Eigen::Matrix4d& odom_e);

// referenced by fastlio_ins_enqueue (laserMapping.cpp:417) but the INS path
// is not exercised by this driver; definition satisfies the linker without
// pulling in the reference's slam_utils.cpp + UTMProjector stack.
Eigen::Matrix4d getTransformFromRPYT(double x, double y, double z,
                                     double yaw, double pitch, double roll) {
  Eigen::Matrix4d t = Eigen::Matrix4d::Identity();
  t.topLeftCorner<3, 3>() =
      (Eigen::AngleAxisd(yaw * M_PI / 180.0, Eigen::Vector3d::UnitZ()) *
       Eigen::AngleAxisd(pitch * M_PI / 180.0, Eigen::Vector3d::UnitY()) *
       Eigen::AngleAxisd(roll * M_PI / 180.0, Eigen::Vector3d::UnitX()))
          .toRotationMatrix();
  t.topRightCorner<3, 1>() = Eigen::Vector3d(x, y, z);
  return t;
}

template <typename T>
static T rd(std::ifstream& f) {
  T v;
  f.read(reinterpret_cast<char*>(&v), sizeof(T));
  return v;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s replay.bin [traj_out.txt] [warmup=27]\n",
                 argv[0]);
    return 1;
  }
  const std::uint32_t warmup = argc > 3 ? std::uint32_t(atoi(argv[3])) : 27;
  std::ifstream f(argv[1], std::ios::binary);
  char magic[8] = {0};
  f.read(magic, 8);
  if (std::strncmp(magic, "LSDR1", 5) != 0) {
    std::fprintf(stderr, "bad magic\n");
    return 1;
  }
  const std::uint32_t n_scans = rd<std::uint32_t>(f);

  std::vector<double> extT = {0.0, 0.0, 0.0};
  std::vector<double> extR = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  // production parameters: slam/mapping/fastlio/fastlio.cpp:161
  fastlio_init(extT, extR, /*filter_num=*/1, /*max_point_num=*/-1,
               /*scan_period=*/0.1, /*undistort=*/true);

  FILE* traj = argc > 2 ? std::fopen(argv[2], "w") : nullptr;

  double total_s = 0.0;
  std::uint32_t timed = 0;
  for (std::uint32_t k = 0; k < n_scans; ++k) {
    const std::uint64_t stamp_us = rd<std::uint64_t>(f);
    const std::uint32_t n_imu = rd<std::uint32_t>(f);
    std::vector<ImuType> imus(n_imu);
    for (auto& im : imus) {
      // sequential reads: constructor-argument evaluation order is
      // unspecified in C++, so never nest rd<>() calls
      double v[7];
      for (double& x : v) x = rd<double>(f);
      im.stamp = v[0];
      im.gyr = Eigen::Vector3d(v[1], v[2], v[3]);
      im.acc = Eigen::Vector3d(v[4], v[5], v[6]);
    }
    const std::uint32_t n_pts = rd<std::uint32_t>(f);
    PointCloudAttrPtr scan(new PointCloudAttr());
    scan->cloud->header.stamp = stamp_us;
    scan->cloud->points.resize(n_pts);
    scan->attr.resize(n_pts);
    for (std::uint32_t i = 0; i < n_pts; ++i) {
      auto& p = scan->cloud->points[i];
      p.x = rd<float>(f);
      p.y = rd<float>(f);
      p.z = rd<float>(f);
      p.intensity = rd<float>(f);
      scan->attr[i].id = int(i);
      scan->attr[i].stamp = rd<std::uint32_t>(f);
    }

    const auto t0 = std::chrono::steady_clock::now();
    for (auto& im : imus) fastlio_imu_enqueue(im);
    fastlio_pcl_enqueue(scan);
    while (fastlio_main()) {
    }
    const auto t1 = std::chrono::steady_clock::now();
    // skip warmup scans (rest/spin-up + first-scan latch + map init)
    if (k >= warmup) {
      total_s += std::chrono::duration<double>(t1 - t0).count();
      ++timed;
    }
    if (traj) {
      Eigen::Matrix4d odom_s, odom_e;
      fastlio_odometry(odom_s, odom_e);
      std::fprintf(traj, "%llu", (unsigned long long)stamp_us);
      for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 4; ++c) std::fprintf(traj, " %.9f", odom_e(r, c));
      std::fprintf(traj, "\n");
    }
  }
  if (traj) std::fclose(traj);

  const double per_scan_ms = timed ? 1e3 * total_s / timed : 0.0;
  std::printf(
      "{\"impl\": \"reference_fastlio_cpu\", \"scans\": %u, "
      "\"per_scan_ms\": %.3f, \"scans_per_sec\": %.2f}\n",
      timed, per_scan_ms, timed ? timed / total_s : 0.0);
  return 0;
}
