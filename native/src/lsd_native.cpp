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
  // packet relay ("package transfer", ref lidar_driver.cpp:368-375):
  // mirror every received datagram to a destination host
  std::atomic<bool> relay_on{false};
  std::mutex relay_mutex;
  sockaddr_in relay_addr{};
  int relay_fd = -1;
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
      if (r->relay_on.load(std::memory_order_relaxed)) {
        std::lock_guard<std::mutex> lock(r->relay_mutex);
        if (r->relay_fd >= 0) {
          ::sendto(r->relay_fd, buf.data(), static_cast<size_t>(n), 0,
                   reinterpret_cast<sockaddr*>(&r->relay_addr),
                   sizeof(r->relay_addr));
        }
      }
    } else if (n < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
      continue;  // timeout tick: re-check running flag
    }
  }
}

}  // namespace

extern "C" {

// Source fingerprint injected by the Makefile; the Python loader compares
// this against a hash of the checked-out sources and rebuilds on mismatch
// (mtime comparison is unreliable after a git checkout).
#ifndef LSD_SRC_SHA
#define LSD_SRC_SHA "unversioned"
#endif
const char* lsd_src_sha(void) { return LSD_SRC_SHA; }

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
  if (r->relay_fd >= 0) ::close(r->relay_fd);
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

// Start/stop mirroring received datagrams to dest_ip:dest_port
// (ref LidarDriver::startPackageTransfer / stopPackageTransfer,
// lidar_driver.cpp:368-375).  Returns 0 on success.
int lsd_udp_relay(int handle, const char* dest_ip, uint16_t dest_port) {
  Receiver* r = nullptr;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    auto it = g_receivers.find(handle);
    if (it == g_receivers.end()) return -1;
    r = it->second;
  }
  if (dest_ip == nullptr || dest_ip[0] == '\0') {   // stop
    r->relay_on = false;
    std::lock_guard<std::mutex> lock(r->relay_mutex);
    if (r->relay_fd >= 0) ::close(r->relay_fd);
    r->relay_fd = -1;
    return 0;
  }
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(dest_port);
  if (::inet_pton(AF_INET, dest_ip, &addr.sin_addr) != 1) return -2;
  int fd = ::socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -3;
  {
    std::lock_guard<std::mutex> lock(r->relay_mutex);
    if (r->relay_fd >= 0) ::close(r->relay_fd);
    r->relay_fd = fd;
    r->relay_addr = addr;
  }
  r->relay_on = true;
  return 0;
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

// LS-C-16 (LeiShen C16, 1206-byte packets): identical block layout to
// VLP-16 (12 x {u16 0xEEFF, u16 azimuth LE 0.01 deg, 2 firings x 16 x
// {u16 distance LE, u8 intensity}}) but distance LSB is 1 cm and the
// altitude table is the interleaved -15..+15 deg ladder.
// (Reference: packagePrase_LS_C_16, lidar_driver.cpp:473; constants
// DecoderBase.h:19-63.)
static const float kLsc16Elev[16] = {
    -15.f, 1.f, -13.f, 3.f, -11.f, 5.f, -9.f, 7.f,
    -7.f,  9.f, -5.f, 11.f, -3.f, 13.f, -1.f, 15.f};

int lsd_decode_lsc16(const uint8_t* pkts, const uint32_t* lens, int n_pkts,
                     uint32_t stride, float* out_xyzi, int max_points) {
  int count = 0;
  for (int p = 0; p < n_pkts; ++p) {
    const uint8_t* pkt = pkts + p * stride;
    if (lens[p] != 1206) continue;
    for (int b = 0; b < 12; ++b) {
      const uint8_t* blk = pkt + b * 100;
      const uint16_t flag = blk[0] | (blk[1] << 8);
      if (flag != 0xEEFF) continue;
      const float az0 = (blk[2] | (blk[3] << 8)) * 0.01f;
      float az1 = az0 + 0.36f;
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
          const float dist = dist_raw * 0.01f;
          if (dist < 0.2f || dist > 150.f) continue;
          const float elev = kLsc16Elev[ch] * static_cast<float>(M_PI) / 180.f;
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

// ---------------------------------------------------------------------------
// RoboSense family (shared helpers).  All RS mechanical lidars use
// centidegree (0.01 deg) integer angles, big-endian fields, and the
// "lens center" xy correction:
//   x =  d cos(v) cos(af) + RX cos(a0)
//   y = -d cos(v) sin(af) - RX sin(a0)
//   z =  d sin(v)
// where af is the horizontally-calibrated azimuth and a0 the raw channel
// azimuth.  (Reference: packagePrase_RS_* in lidar_driver.cpp:949-1299.)

static inline float rs_rad(int centideg) {
  return centideg * 0.01f * static_cast<float>(M_PI) / 180.f;
}
static inline uint16_t rs_be16(const uint8_t* b) {
  return static_cast<uint16_t>((b[0] << 8) | b[1]);
}

// RS-LiDAR-32 (1248 B): 42-byte header (u64 id 0xA050A55A0A05AA55 LE) then
// 12 blocks x {u16 0xEEFF, u16 azimuth BE, 32 x {u16 dist BE, u8 int}};
// distance LSB 5 mm; per-channel firing-time azimuth advance
// 0.018*1.44*(2*(ch%16)+ch/16) of the block delta; default factory
// vertical/horizontal calibration tables in centidegrees.
// (Reference: packagePrase_RS_LiDAR_32, lidar_driver.cpp:949-1019; default
// tables :1691-1703.)
static const int kRs32Vert[32] = {
    -1031, -642, 229, 329, 463, 700, 1033, 1506,
    29, 0, -36, -70, 163, 126, 96, 63,
    -2500, -1460, -791, -540, -370, -400, -436, -470,
    -236, -266, -300, -333, -100, -133, -170, -200};
static const int kRs32Horiz[32] = {
    813, 818, 840, -672, 826, -720, 826, -726,
    -766, -241, 279, 818, -778, -250, 284, 813,
    -782, -772, -748, -741, -760, -241, 296, 826,
    -764, -240, 292, 823, -757, -231, 301, 828};

int lsd_decode_rs32(const uint8_t* pkts, const uint32_t* lens, int n_pkts,
                    uint32_t stride, const int* vert_cd, const int* horiz_cd,
                    float* out_xyzi, int max_points) {
  if (!vert_cd) vert_cd = kRs32Vert;
  if (!horiz_cd) horiz_cd = kRs32Horiz;
  int count = 0;
  for (int p = 0; p < n_pkts; ++p) {
    const uint8_t* pkt = pkts + p * stride;
    if (lens[p] != 1248) continue;
    uint64_t id;
    std::memcpy(&id, pkt, 8);
    if (id != 0xA050A55A0A05AA55ull) continue;
    const uint8_t* body = pkt + 42;
    for (int b = 0; b < 12; ++b) {
      const uint8_t* blk = body + b * 100;
      if (!(blk[0] == 0xFF && blk[1] == 0xEE)) break;
      const int cur = rs_be16(blk + 2);
      int other = b + 1 < 12 ? rs_be16(body + (b + 1) * 100 + 2)
                             : rs_be16(body + (b - 1) * 100 + 2);
      float azd = static_cast<float>((36000 + (b + 1 < 12 ? other - cur
                                                          : cur - other)) % 36000);
      for (int ch = 0; ch < 32; ++ch) {
        const uint8_t* rec = blk + 4 + ch * 3;
        const float dist = rs_be16(rec) * 0.005f;
        if (dist < 0.2f || dist > 200.f || count >= max_points) continue;
        const float az_ori =
            cur + azd * 0.018f * 1.44f * (2 * (ch % 16) + (ch / 16));
        const int az_fin =
            (static_cast<int>(az_ori) + horiz_cd[ch] + 36000) % 36000;
        const int a0 = (static_cast<int>(az_ori) + 36000) % 36000;
        const float v = rs_rad((vert_cd[ch] + 36000) % 36000);
        const float cv = std::cos(v);
        float* o = out_xyzi + count * 4;
        o[0] = dist * cv * std::cos(rs_rad(az_fin)) +
               0.03997f * std::cos(rs_rad(a0));
        o[1] = -dist * cv * std::sin(rs_rad(az_fin)) -
               0.03997f * std::sin(rs_rad(a0));
        o[2] = dist * std::sin(v);
        o[3] = rec[2] / 255.0f;
        ++count;
      }
    }
  }
  return count;
}

// RS-Ruby-Lite (80 beam, 1248 B): 80-byte header (u32 id 0x5A05AA55 LE)
// then 4 blocks x {u8 0xFE, u8 ret_id, u16 azimuth BE, 80 x {u16 dist BE,
// u8 int}}; distance LSB 5 mm; channel azimuth advance
// (ch/4 % 16)*3.236*0.018 of the block delta (default 20 cd when the
// measured delta spans the FOV blind zone).
// (Reference: packagePrase_RS_Ruby_Lite, lidar_driver.cpp:1021-1094;
// default tables :1705-1723.)
static const int kRs80Vert[80] = {
    -1356, -109, -439, -29, -359, -579, 51, -279, 351, -498,
    -199, 506, -419, -1958, -129, -339, -715, -49, -259, -599,
    31, -179, -519, -99, -2500, -19, -765, 61, -269, 141, -189,
    -1604, -119, -685, -39, 41, -289, 656, 121, -208, -835, -69,
    -399, -619, 11, -319, -539, 91, -239, -459, -159, -379, 251,
    -1034, -89, -299, -9, -219, -559, 71, -139, 1150, -479, -58,
    -1174, 21, -650, 101, -229, 181, -149, 900, -924, -79, 1,
    81, -249, 1500, 161, -169};
static const int kRs80Horiz[80] = {
    595, 425, 255, 425, 255, 595, 425, 255, 85, 595, 255,
    85, 595, 255, 85, 595, 255, 85, 595, 255, 85, 595, 255,
    595, 85, 595, 85, 595, 425, 595, 425, 425, 255, 425, 255,
    255, 85, 595, 255, 85, -85, -255, -425, -85, -255, -425,
    -85, -255, -425, -85, -425, -85, -255, -425, -595, -85,
    -595, -85, -425, -595, -85, -255, -425, -85, -595, -85,
    -595, -85, -255, -85, -255, -425, -255, -425, -425, -425,
    -595, -85, -425, -595};

int lsd_decode_rs_ruby(const uint8_t* pkts, const uint32_t* lens, int n_pkts,
                       uint32_t stride, const int* vert_cd,
                       const int* horiz_cd, float* out_xyzi, int max_points) {
  if (!vert_cd) vert_cd = kRs80Vert;
  if (!horiz_cd) horiz_cd = kRs80Horiz;
  int count = 0;
  for (int p = 0; p < n_pkts; ++p) {
    const uint8_t* pkt = pkts + p * stride;
    if (lens[p] != 1248) continue;
    uint32_t id;
    std::memcpy(&id, pkt, 4);
    if (id != 0x5A05AA55u) continue;
    const uint8_t* body = pkt + 80;
    const size_t blk_size = 4 + 80 * 3;  // 244
    for (int b = 0; b < 4; ++b) {
      const uint8_t* blk = body + b * blk_size;
      if (blk[0] != 0xFE) break;
      const int cur = rs_be16(blk + 2);
      int other = b + 1 < 4 ? rs_be16(body + (b + 1) * blk_size + 2)
                            : rs_be16(body + (b - 1) * blk_size + 2);
      float azd = static_cast<float>((36000 + (b + 1 < 4 ? other - cur
                                                         : cur - other)) % 36000);
      if (azd > 100.f) azd = 20.f;  // FOV blind-zone fallback
      for (int ch = 0; ch < 80; ++ch) {
        const uint8_t* rec = blk + 4 + ch * 3;
        const float dist = rs_be16(rec) * 0.005f;
        if (dist < 0.2f || dist > 200.f || count >= max_points) continue;
        const float az_ori = cur + azd * ((ch / 4) % 16) * 3.236f * 0.018f;
        const int az_fin =
            (static_cast<int>(az_ori) + horiz_cd[ch] + 36000) % 36000;
        const int a0 = (static_cast<int>(az_ori) + 36000) % 36000;
        const float v = rs_rad((vert_cd[ch] + 36000) % 36000);
        const float cv = std::cos(v);
        float* o = out_xyzi + count * 4;
        o[0] = dist * cv * std::cos(rs_rad(az_fin)) +
               0.03615f * std::cos(rs_rad(a0));
        o[1] = -dist * cv * std::sin(rs_rad(az_fin)) -
               0.03615f * std::sin(rs_rad(a0));
        o[2] = dist * std::sin(v);
        o[3] = rec[2] / 255.0f;
        ++count;
      }
    }
  }
  return count;
}

// RS-Helios / RS-Helios-16P (1248 B): 42-byte header (u32 id 0x5A05AA55
// LE) then 12 blocks x {2-byte id 0xFF 0xEE, u16 azimuth BE, 32 x {u16
// dist BE, u8 int}}; distance LSB 2.5 mm; per-channel azimuth advance =
// block delta * firing_time[ch]/55.56 us; lens center RX 0.03498 m.  The
// 16P fires 16 lasers twice per block (laser = ch % 16).  Exact per-unit
// calibration arrives in the DIFOP stream on port+1 — pass those tables
// here; the defaults are the uniform factory ladder.
// (Reference: packagePrase_RS_Helios{,_16P}, lidar_driver.cpp:1096-1242;
// const params rs_decode_difop.h:210-285.)
static const float kHeliosChanAz[32] = {
    0.00f / 55.56f,  1.57f / 55.56f,  3.15f / 55.56f,  4.72f / 55.56f,
    6.30f / 55.56f,  7.87f / 55.56f,  9.45f / 55.56f,  11.36f / 55.56f,
    13.26f / 55.56f, 15.17f / 55.56f, 17.08f / 55.56f, 18.99f / 55.56f,
    20.56f / 55.56f, 22.14f / 55.56f, 23.71f / 55.56f, 25.29f / 55.56f,
    26.53f / 55.56f, 29.01f / 55.56f, 27.77f / 55.56f, 30.25f / 55.56f,
    31.49f / 55.56f, 33.98f / 55.56f, 32.73f / 55.56f, 35.22f / 55.56f,
    36.46f / 55.56f, 37.70f / 55.56f, 38.94f / 55.56f, 40.18f / 55.56f,
    41.42f / 55.56f, 42.67f / 55.56f, 43.91f / 55.56f, 45.15f / 55.56f};
// Factory default verticals: Helios-32 is a -25..+15 deg ladder, 16P a
// uniform -15..+15 ladder (RS16-style ordering).
static const int kHelios32Vert[32] = {
    -2500, -1800, -1500, -1200, -1000, -800, -700, -600,
    -500, -400, -300, -267, -233, -200, -167, -133,
    -100, -67, -33, 0, 33, 67, 100, 133,
    167, 200, 300, 400, 500, 700, 1000, 1500};
static const int kHelios16Vert[16] = {
    -1500, -1300, -1100, -900, -700, -500, -300, -100,
    100, 300, 500, 700, 900, 1100, 1300, 1500};

int lsd_decode_rs_helios(const uint8_t* pkts, const uint32_t* lens,
                         int n_pkts, uint32_t stride, int n_lasers,
                         const int* vert_cd, const int* horiz_cd,
                         float* out_xyzi, int max_points) {
  const int* vdef = n_lasers == 16 ? kHelios16Vert : kHelios32Vert;
  if (!vert_cd) vert_cd = vdef;
  int count = 0;
  for (int p = 0; p < n_pkts; ++p) {
    const uint8_t* pkt = pkts + p * stride;
    if (lens[p] != 1248) continue;
    uint32_t id;
    std::memcpy(&id, pkt, 4);
    if (id != 0x5A05AA55u) continue;
    const uint8_t* body = pkt + 42;
    for (int b = 0; b < 12; ++b) {
      const uint8_t* blk = body + b * 100;
      if (!(blk[0] == 0xFF && blk[1] == 0xEE)) break;
      const int cur = rs_be16(blk + 2);
      int other = b + 1 < 12 ? rs_be16(body + (b + 1) * 100 + 2)
                             : rs_be16(body + (b - 1) * 100 + 2);
      float azd = static_cast<float>((36000 + (b + 1 < 12 ? other - cur
                                                          : cur - other)) % 36000);
      if (azd > 100.f) azd = 20.f;
      for (int ch = 0; ch < 32; ++ch) {
        const uint8_t* rec = blk + 4 + ch * 3;
        const float dist = rs_be16(rec) * 0.0025f;
        if (dist < 0.4f || dist > 200.f || count >= max_points) continue;
        const int laser = n_lasers == 16 ? ch % 16 : ch;
        const int az_ori = cur + static_cast<int>(azd * kHeliosChanAz[ch]);
        const int az_fin =
            (az_ori + (horiz_cd ? horiz_cd[laser] : 0) + 36000) % 36000;
        const int a0 = (az_ori + 36000) % 36000;
        const float v = rs_rad((vert_cd[laser] + 36000) % 36000);
        const float cv = std::cos(v);
        float* o = out_xyzi + count * 4;
        o[0] = dist * cv * std::cos(rs_rad(az_fin)) +
               0.03498f * std::cos(rs_rad(a0));
        o[1] = -dist * cv * std::sin(rs_rad(az_fin)) -
               0.03498f * std::sin(rs_rad(a0));
        o[2] = dist * std::sin(v);
        o[3] = rec[2] / 255.0f;
        ++count;
      }
    }
  }
  return count;
}

// RS-LiDAR-M1 (solid state, 1210 B): 32-byte header {u32 id 0xA55AAA55 LE,
// u16 pkt_cnt BE, ...} then 25 blocks x {u8 time_offset, u8 return_seq,
// 5 x {u16 dist BE, u16 pitch BE, u16 yaw BE, u8 int, u8 attr, u8
// elongation}}; distance LSB 5 mm; pitch/yaw are absolute centidegree
// angles biased by 32768:
//   x = d cos(p) cos(y); y = d cos(p) sin(y); z = d sin(p)
// (Reference: packagePrase_RS_LiDAR_M1, lidar_driver.cpp:1244-1299; struct
// DecoderBase.h:506-542.)
int lsd_decode_rs_m1(const uint8_t* pkts, const uint32_t* lens, int n_pkts,
                     uint32_t stride, float* out_xyzi, int max_points) {
  int count = 0;
  for (int p = 0; p < n_pkts; ++p) {
    const uint8_t* pkt = pkts + p * stride;
    if (lens[p] != 1210) continue;
    uint32_t id;
    std::memcpy(&id, pkt, 4);
    if (id != 0xA55AAA55u) continue;
    const uint8_t* body = pkt + 32;
    const size_t blk_size = 2 + 5 * 9;  // 47
    for (int b = 0; b < 25; ++b) {
      const uint8_t* blk = body + b * blk_size;
      for (int ch = 0; ch < 5; ++ch) {
        const uint8_t* rec = blk + 2 + ch * 9;
        const float dist = rs_be16(rec) * 0.005f;
        if (dist < 0.2f || dist > 200.f || count >= max_points) continue;
        const float pitch = rs_rad(static_cast<int>(rs_be16(rec + 2)) - 32768);
        const float yaw = rs_rad(static_cast<int>(rs_be16(rec + 4)) - 32768);
        const float cp = std::cos(pitch);
        float* o = out_xyzi + count * 4;
        o[0] = dist * cp * std::cos(yaw);
        o[1] = dist * cp * std::sin(yaw);
        o[2] = dist * std::sin(pitch);
        o[3] = rec[6] / 255.0f;
        ++count;
      }
    }
  }
  return count;
}

// Ouster RNG19_RFL8_SIG16_NIR16 (v3 / "single return") profile: 32-byte
// packet header {u16 packet_type, u16 frame_id, ...} then 16 columns x
// {u64 timestamp, u16 measurement_id, u16 status, rings x 12-byte px
// {u32 range_mm (19:0), u8 refl, pad, u16 signal, u16 NIR, pad}}; 1024
// columns/rev.  Geometry uses the beam-to-lidar offset n (mm):
//   enc = 2 pi (1 - m_id/1024);  az = -beam_az[ch] deg
//   x = -((r-n) cos(az+enc) cos(alt) + n cos(enc)) / 1000
//   y = -((r-n) sin(az+enc) cos(alt) + n sin(enc)) / 1000
//   z = (r-n) sin(alt) / 1000 + z_offset
// (Reference: packagePrase_Ouster_V3, lidar_driver.cpp:783-869.)
int lsd_decode_ouster_v3(const uint8_t* pkts, const uint32_t* lens,
                         int n_pkts, uint32_t stride, int rings,
                         const float* beam_alt_deg, const float* beam_az_deg,
                         float beam_to_lidar_mm, float z_offset,
                         float* out_xyzi, int max_points) {
  const size_t col_bytes = 12 + static_cast<size_t>(rings) * 12;
  const size_t pkt_size = 32 + 16 * col_bytes;
  const float two_pi = 2.0f * static_cast<float>(M_PI);
  const float n = beam_to_lidar_mm;
  int count = 0;
  for (int p = 0; p < n_pkts; ++p) {
    const uint8_t* pkt = pkts + p * stride;
    if (lens[p] < pkt_size) continue;
    for (int c = 0; c < 16; ++c) {
      const uint8_t* col = pkt + 32 + c * col_bytes;
      uint16_t m_id, status;
      std::memcpy(&m_id, col + 8, 2);
      std::memcpy(&status, col + 10, 2);
      if (m_id >= 1024 || !(status & 0x1)) continue;
      const float enc = two_pi * (1.0f - m_id / 1024.0f);
      for (int ch = 0; ch < rings; ++ch) {
        const uint8_t* px = col + 12 + ch * 12;
        uint32_t range_raw;
        std::memcpy(&range_raw, px, 4);
        range_raw &= 0x000FFFFFu;
        if (range_raw == 0 || count >= max_points) continue;
        uint16_t signal;
        std::memcpy(&signal, px + 6, 2);
        const float r = static_cast<float>(range_raw);
        const float az =
            -beam_az_deg[ch] * static_cast<float>(M_PI) / 180.f;
        const float alt =
            beam_alt_deg[ch] * static_cast<float>(M_PI) / 180.f;
        const float calt = std::cos(alt);
        float* o = out_xyzi + count * 4;
        o[0] = -((r - n) * std::cos(az + enc) * calt + n * std::cos(enc)) *
               0.001f;
        o[1] = -((r - n) * std::sin(az + enc) * calt + n * std::sin(enc)) *
               0.001f;
        o[2] = (r - n) * std::sin(alt) * 0.001f + z_offset;
        o[3] = std::min(signal / 2048.0f, 1.0f);
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
