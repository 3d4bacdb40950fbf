// lsd_native: host-side sensor ingest runtime (C API for ctypes).
//
// TPU-native re-implementation of the reference's native driver layer
// (sensor_driver/lidar_driver/src/lidar_driver.cpp UDP capture +
// packagePrase_* decoders; sensor_driver/common_lib/network_driver/
// UDPServer): a per-sensor UDP receive thread feeds an SPSC packet ring;
// decoders turn packet batches into float32 point arrays; a point
// post-process applies extrinsics + range/exclude filtering (the work
// lidar_driver does before handing scans to Python).
//
// Exposed as extern "C" for ctypes — no pybind11 in this image.

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <thread>
#include <vector>

#include "ring_buffer.h"

namespace {

constexpr size_t kMaxPacket = 2048;

struct Receiver {
  explicit Receiver(size_t max_packet)
      : ring(8192, max_packet), max_packet(max_packet) {}
  int fd = -1;
  std::thread thread;
  std::atomic<bool> running{false};
  lsd::PacketRing ring;
  size_t max_packet;
  uint64_t received = 0;
};

std::mutex g_mutex;
std::map<int, Receiver*> g_receivers;
int g_next_handle = 1;

void recv_loop(Receiver* r) {
  std::vector<uint8_t> buf(r->max_packet);
  while (r->running.load(std::memory_order_relaxed)) {
    const ssize_t n = ::recv(r->fd, buf.data(), buf.size(), 0);
    if (n > 0) {
      r->ring.push(buf.data(), static_cast<size_t>(n));
      ++r->received;
    } else if (n < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
      continue;  // timeout tick: re-check running flag
    }
  }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// UDP receiver lifecycle

int lsd_udp_open(uint16_t port, uint32_t max_packet) {
  if (max_packet == 0) max_packet = kMaxPacket;
  int fd = ::socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -1;
  int reuse = 1;
  ::setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &reuse, sizeof(reuse));
  int rcvbuf = 8 * 1024 * 1024;  // design load: 128-beam ~20 MB/s
  ::setsockopt(fd, SOL_SOCKET, SO_RCVBUF, &rcvbuf, sizeof(rcvbuf));
  timeval tv{0, 100000};  // 100 ms recv timeout so the thread can exit
  ::setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(port);
  if (::bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
    ::close(fd);
    return -2;
  }
  auto* r = new Receiver(max_packet);
  r->fd = fd;
  r->running = true;
  r->thread = std::thread(recv_loop, r);
  std::lock_guard<std::mutex> lock(g_mutex);
  const int handle = g_next_handle++;
  g_receivers[handle] = r;
  return handle;
}

void lsd_udp_close(int handle) {
  Receiver* r = nullptr;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    auto it = g_receivers.find(handle);
    if (it == g_receivers.end()) return;
    r = it->second;
    g_receivers.erase(it);
  }
  r->running = false;
  if (r->thread.joinable()) r->thread.join();
  ::close(r->fd);
  delete r;
}

// Pop up to max_packets into out (stride 2048); returns count.
int lsd_udp_pop(int handle, uint8_t* out, uint32_t* lens, int max_packets) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_receivers.find(handle);
  if (it == g_receivers.end()) return -1;
  return static_cast<int>(it->second->ring.pop(out, lens,
                                               static_cast<size_t>(max_packets)));
}

uint64_t lsd_udp_stats(int handle, uint64_t* dropped) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_receivers.find(handle);
  if (it == g_receivers.end()) return 0;
  if (dropped) *dropped = it->second->ring.dropped();
  return it->second->received;
}

// ---------------------------------------------------------------------------
// Decoders
//
// VLP-16 (Velodyne 1206-byte packets): 12 blocks x (2-byte flag, 2-byte
// azimuth, 32 x (2-byte distance, 1-byte intensity)); 2 firing sequences of
// the 16 lasers per block; distance LSB 2 mm; elevation table per spec.
// (Reference decoder: packagePrase_VLP_16 in lidar_driver.cpp.)

static const float kVlp16Elev[16] = {
    -15.f, 1.f, -13.f, 3.f, -11.f, 5.f, -9.f, 7.f,
    -7.f,  9.f, -5.f, 11.f, -3.f, 13.f, -1.f, 15.f};

// decode packets (n x 2048 stride, lens) -> xyzi float array; returns count.
int lsd_decode_vlp16(const uint8_t* pkts, const uint32_t* lens, int n_pkts,
                     uint32_t stride, float* out_xyzi, int max_points) {
  int count = 0;
  for (int p = 0; p < n_pkts; ++p) {
    const uint8_t* pkt = pkts + p * stride;
    if (lens[p] != 1206) continue;
    // azimuth interpolation between consecutive blocks
    for (int b = 0; b < 12; ++b) {
      const uint8_t* blk = pkt + b * 100;
      const uint16_t flag = blk[0] | (blk[1] << 8);
      if (flag != 0xEEFF) continue;
      const float az0 = (blk[2] | (blk[3] << 8)) * 0.01f;
      float az1 = az0 + 0.2f;  // nominal delta when last block
      if (b + 1 < 12) {
        const uint8_t* nb = pkt + (b + 1) * 100;
        az1 = (nb[2] | (nb[3] << 8)) * 0.01f;
        if (az1 < az0) az1 += 360.f;
      }
      for (int seq = 0; seq < 2; ++seq) {
        const float az = az0 + (az1 - az0) * 0.5f * seq;
        const float az_rad = az * static_cast<float>(M_PI) / 180.f;
        for (int ch = 0; ch < 16; ++ch) {
          const uint8_t* rec = blk + 4 + (seq * 16 + ch) * 3;
          const uint16_t dist_raw = rec[0] | (rec[1] << 8);
          if (dist_raw == 0 || count >= max_points) continue;
          const float dist = dist_raw * 0.002f;
          const float elev =
              kVlp16Elev[ch] * static_cast<float>(M_PI) / 180.f;
          const float xy = dist * std::cos(elev);
          float* o = out_xyzi + count * 4;
          o[0] = xy * std::sin(az_rad);
          o[1] = xy * std::cos(az_rad);
          o[2] = dist * std::sin(elev);
          o[3] = rec[2] / 255.0f;
          ++count;
        }
      }
    }
  }
  return count;
}

// RoboSense RS16 (1248-byte MSOP packets): 42-byte header then 12 blocks x
// (2-byte 0xFFEE flag, 2-byte azimuth BE 0.01 deg, 32 x (2-byte distance BE,
// 1-byte intensity)); two firing sequences of 16 lasers per block; distance
// LSB 0.25 cm.  (Reference decoder: packagePrase_RS_16 / DecoderBase.h.)
static const float kRs16Elev[16] = {
    -15.f, -13.f, -11.f, -9.f, -7.f, -5.f, -3.f, -1.f,
    15.f,  13.f,  11.f,  9.f,  7.f,  5.f,  3.f,  1.f};

int lsd_decode_rs16(const uint8_t* pkts, const uint32_t* lens, int n_pkts,
                    uint32_t stride, float* out_xyzi, int max_points) {
  int count = 0;
  for (int p = 0; p < n_pkts; ++p) {
    const uint8_t* pkt = pkts + p * stride;
    if (lens[p] != 1248) continue;
    const uint8_t* body = pkt + 42;
    for (int b = 0; b < 12; ++b) {
      const uint8_t* blk = body + b * 100;
      if (!(blk[0] == 0xFF && blk[1] == 0xEE)) continue;
      const float az0 = ((blk[2] << 8) | blk[3]) * 0.01f;
      float az1 = az0 + 0.36f;
      if (b + 1 < 12) {
        const uint8_t* nb = body + (b + 1) * 100;
        az1 = ((nb[2] << 8) | nb[3]) * 0.01f;
        if (az1 < az0) az1 += 360.f;
      }
      for (int seq = 0; seq < 2; ++seq) {
        const float az = az0 + (az1 - az0) * 0.5f * seq;
        const float az_rad = az * static_cast<float>(M_PI) / 180.f;
        for (int ch = 0; ch < 16; ++ch) {
          const uint8_t* rec = blk + 4 + (seq * 16 + ch) * 3;
          const uint16_t dist_raw = (rec[0] << 8) | rec[1];  // big endian
          if (dist_raw == 0 || count >= max_points) continue;
          const float dist = dist_raw * 0.0025f;
          const float elev = kRs16Elev[ch] * static_cast<float>(M_PI) / 180.f;
          const float xy = dist * std::cos(elev);
          float* o = out_xyzi + count * 4;
          o[0] = xy * std::sin(az_rad);
          o[1] = xy * std::cos(az_rad);
          o[2] = dist * std::sin(elev);
          o[3] = rec[2] / 255.0f;
          ++count;
        }
      }
    }
  }
  return count;
}

// Livox (Mid-360 class) point packets, data type 2 (cartesian single
// return): 18-byte header {u8 version, u8 slot, u8 id, u8 rsvd, u32
// status, u8 timestamp_type, u8 data_type, u64 timestamp_ns} then 96 x
// {int32 x_mm, int32 y_mm, int32 z_mm, u8 reflectivity, u8 tag}.
// (Reference decoder: packagePrase_Livox in lidar_driver.cpp.)
int lsd_decode_livox(const uint8_t* pkts, const uint32_t* lens, int n_pkts,
                     uint32_t stride, float* out_xyzi, int max_points, uint64_t* stamp_ns) {
  int count = 0;
  for (int p = 0; p < n_pkts; ++p) {
    const uint8_t* pkt = pkts + p * stride;
    const uint32_t len = lens[p];
    if (len < 18) continue;
    const uint8_t data_type = pkt[9];
    if (data_type != 2) continue;
    uint64_t ts;
    std::memcpy(&ts, pkt + 10, 8);
    if (stamp_ns && ts) *stamp_ns = ts;
    const uint32_t n = (len - 18) / 14;
    for (uint32_t i = 0; i < n && count < max_points; ++i) {
      const uint8_t* rec = pkt + 18 + i * 14;
      int32_t x, y, z;
      std::memcpy(&x, rec, 4);
      std::memcpy(&y, rec + 4, 4);
      std::memcpy(&z, rec + 8, 4);
      if (x == 0 && y == 0 && z == 0) continue;
      float* o = out_xyzi + count * 4;
      o[0] = x * 0.001f;
      o[1] = y * 0.001f;
      o[2] = z * 0.001f;
      o[3] = rec[12] / 255.0f;
      ++count;
    }
  }
  return count;
}

// Ouster LEGACY profile (OS1/OS2): packets of 16 measurement blocks, each
// {u64 timestamp, u16 measurement_id, u16 frame_id, u32 encoder_count}
// followed by n_beams x {u32 range_mm (bits 19:0), u16 reflectivity,
// u16 signal, u16 noise, u16 pad} (12 bytes) and a u32 block status.
// Azimuth = 2*pi*(1 - encoder/90112) + beam_azimuth; elevation from the
// sensor's beam-altitude table (metadata JSON).  Packet size for 64 beams:
// 16*(16 + 64*12 + 4) = 12608 bytes.  (Reference: packagePrase_Ouster.)
int lsd_decode_ouster(const uint8_t* pkts, const uint32_t* lens, int n_pkts,
                      uint32_t stride, int n_beams, const float* beam_alt_deg,
                      const float* beam_az_deg, float* out_xyzi,
                      int max_points) {
  const size_t block_size = 16 + static_cast<size_t>(n_beams) * 12 + 4;
  const size_t pkt_size = 16 * block_size;
  const float two_pi = 2.0f * static_cast<float>(M_PI);
  int count = 0;
  for (int p = 0; p < n_pkts; ++p) {
    const uint8_t* pkt = pkts + p * stride;
    if (lens[p] < pkt_size) continue;
    for (int b = 0; b < 16; ++b) {
      const uint8_t* blk = pkt + b * block_size;
      uint32_t status;
      std::memcpy(&status, blk + block_size - 4, 4);
      if (status != 0xFFFFFFFFu) continue;  // invalid azimuth block
      uint32_t encoder;
      std::memcpy(&encoder, blk + 12, 4);
      const float theta_enc = two_pi * (1.0f - encoder / 90112.0f);
      for (int ch = 0; ch < n_beams; ++ch) {
        const uint8_t* rec = blk + 16 + ch * 12;
        uint32_t range_raw;
        std::memcpy(&range_raw, rec, 4);
        range_raw &= 0x000FFFFFu;
        if (range_raw == 0 || count >= max_points) continue;
        const float r = range_raw * 0.001f;
        const float az =
            theta_enc + beam_az_deg[ch] * static_cast<float>(M_PI) / 180.f;
        const float elev =
            beam_alt_deg[ch] * static_cast<float>(M_PI) / 180.f;
        uint16_t refl;
        std::memcpy(&refl, rec + 4, 2);
        float* o = out_xyzi + count * 4;
        const float xy = r * std::cos(elev);
        o[0] = xy * std::cos(az);
        o[1] = xy * std::sin(az);
        o[2] = r * std::sin(elev);
        o[3] = std::min(refl / 255.0f, 1.0f);
        ++count;
      }
    }
  }
  return count;
}

// "Custom" format (reference custom decoder): little-endian header
// {uint32 magic 0x4C53444C ("LDSL"), uint32 n_points, uint64 stamp_us}
// followed by n_points x float32 [x y z intensity].
int lsd_decode_custom(const uint8_t* pkts, const uint32_t* lens, int n_pkts,
                      uint32_t stride, float* out_xyzi, int max_points, uint64_t* stamp_us) {
  int count = 0;
  for (int p = 0; p < n_pkts; ++p) {
    const uint8_t* pkt = pkts + p * stride;
    const uint32_t len = lens[p];
    if (len < 16) continue;
    uint32_t magic, n;
    uint64_t ts;
    std::memcpy(&magic, pkt, 4);
    std::memcpy(&n, pkt + 4, 4);
    std::memcpy(&ts, pkt + 8, 8);
    if (magic != 0x4C53444Cu) continue;
    if (16 + n * 16 > len) continue;
    if (stamp_us && ts) *stamp_us = ts;
    const uint32_t take =
        std::min<uint32_t>(n, static_cast<uint32_t>(max_points - count));
    std::memcpy(out_xyzi + count * 4, pkt + 16, take * 16);
    count += take;
  }
  return count;
}

// ---------------------------------------------------------------------------
// Point post-processing: extrinsic transform + range/exclude filter
// (reference: LidarDriver range/exclude filter + setExternalParameter
// transform applied per scan before Python sees it).

int lsd_points_postprocess(float* xyzi, int n, const float* T4x4,
                           float range_min, float range_max,
                           const float* exclude_box /* x0 x1 y0 y1 z0 z1 or null */) {
  int out = 0;
  for (int i = 0; i < n; ++i) {
    float x = xyzi[i * 4 + 0], y = xyzi[i * 4 + 1], z = xyzi[i * 4 + 2];
    const float inten = xyzi[i * 4 + 3];
    if (T4x4) {
      const float tx = T4x4[0] * x + T4x4[1] * y + T4x4[2] * z + T4x4[3];
      const float ty = T4x4[4] * x + T4x4[5] * y + T4x4[6] * z + T4x4[7];
      const float tz = T4x4[8] * x + T4x4[9] * y + T4x4[10] * z + T4x4[11];
      x = tx; y = ty; z = tz;
    }
    const float r = std::sqrt(x * x + y * y);
    if (r < range_min || r > range_max) continue;
    if (exclude_box && x >= exclude_box[0] && x <= exclude_box[1] &&
        y >= exclude_box[2] && y <= exclude_box[3] && z >= exclude_box[4] &&
        z <= exclude_box[5])
      continue;
    float* o = xyzi + out * 4;
    o[0] = x; o[1] = y; o[2] = z; o[3] = inten;
    ++out;
  }
  return out;
}

}  // extern "C"
