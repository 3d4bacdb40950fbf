// SPSC lock-free ring buffer for sensor packet ingest.
//
// TPU-host equivalent of the reference's moodycamel::BlockingReaderWriterQueue
// scanQueue (sensor_driver/lidar_driver/include/lidar_driver.h:102): one
// socket thread produces fixed-size packets, the Python/pipeline side
// consumes batches. Lock-free single-producer single-consumer with
// acquire/release semantics; overwrites-oldest when full (sensor streams
// must never block the NIC thread).
#pragma once

#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

namespace lsd {

class PacketRing {
 public:
  PacketRing(size_t capacity, size_t packet_size)
      : capacity_(capacity),
        packet_size_(packet_size),
        sizes_(capacity, 0),
        data_(capacity * packet_size),
        head_(0),
        tail_(0),
        dropped_(0) {}

  size_t packet_size() const { return packet_size_; }

  // producer thread only
  bool push(const uint8_t* pkt, size_t len) {
    if (len > packet_size_) return false;
    const uint64_t head = head_.load(std::memory_order_relaxed);
    const uint64_t tail = tail_.load(std::memory_order_acquire);
    if (head - tail >= capacity_) {
      // full: drop the NEW packet — only the consumer ever moves tail, so
      // there is no producer/consumer race on it (overload sheds newest,
      // like the reference's frame-drop backpressure)
      dropped_.fetch_add(1, std::memory_order_relaxed);
      return false;
    }
    const size_t slot = head % capacity_;
    std::memcpy(&data_[slot * packet_size_], pkt, len);
    sizes_[slot] = static_cast<uint32_t>(len);
    head_.store(head + 1, std::memory_order_release);
    return true;
  }

  // consumer thread only: pop up to max_packets into out (contiguous,
  // packet_size_ stride); returns count, fills lens.
  size_t pop(uint8_t* out, uint32_t* lens, size_t max_packets) {
    uint64_t tail = tail_.load(std::memory_order_relaxed);
    const uint64_t head = head_.load(std::memory_order_acquire);
    size_t n = 0;
    while (tail < head && n < max_packets) {
      const size_t slot = tail % capacity_;
      std::memcpy(out + n * packet_size_, &data_[slot * packet_size_],
                  packet_size_);
      lens[n] = sizes_[slot];
      ++tail;
      ++n;
    }
    tail_.store(tail, std::memory_order_release);
    return n;
  }

  uint64_t dropped() const { return dropped_.load(std::memory_order_relaxed); }
  size_t size() const {
    return static_cast<size_t>(head_.load(std::memory_order_acquire) -
                               tail_.load(std::memory_order_acquire));
  }

 private:
  const size_t capacity_;
  const size_t packet_size_;
  std::vector<uint32_t> sizes_;
  std::vector<uint8_t> data_;
  std::atomic<uint64_t> head_;
  std::atomic<uint64_t> tail_;
  std::atomic<uint64_t> dropped_;
};

}  // namespace lsd
