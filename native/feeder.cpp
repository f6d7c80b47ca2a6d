// Host-side sensor feeder: timestamp-ordered image + IMU ingest queues.
//
// Native equivalent of the reference wrapper's ingest layer
// (/root/reference/src/imu_mono_realsense.cpp:116-128 QoS'd subscriptions,
// :322-328 img_buf_ drain, :348-368 imu_buf_ under buf_mutex_imu_): bounded
// ring buffers with the same drop policies — lossless-blocking for frames,
// drop-oldest for IMU — plus frame assembly that hands each frame every IMU
// sample in (t_prev, t_frame], the contract the wrapper got wrong
// (SURVEY.md §3.2). Image preprocessing (RGB→gray, bilinear resize to the
// configured resolution, float32 conversion) happens here on the host
// thread so the Python/JAX side receives device-ready arrays.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <vector>

namespace {

struct ImuSample {
  double t;
  double gyro[3];
  double acc[3];
};

struct Frame {
  double t;
  std::vector<float> data;  // H*W float32 grayscale at target resolution
};

struct Feeder {
  int target_w, target_h;
  size_t frame_cap, imu_cap;
  std::deque<Frame> frames;
  std::deque<ImuSample> imu;
  double last_popped_t = -1e300;
  uint64_t dropped_imu = 0;
  uint64_t dropped_frames = 0;
  std::mutex mu;
  std::condition_variable cv;
};

// Bilinear resize + grayscale conversion (channels = 1 or 3, HWC uint8).
void preprocess(const uint8_t* src, int sw, int sh, int channels,
                float* dst, int dw, int dh) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    const float fy = (y + 0.5f) * sy - 0.5f;
    const int y0 = std::clamp(static_cast<int>(fy), 0, sh - 1);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float wy = std::clamp(fy - y0, 0.0f, 1.0f);
    for (int x = 0; x < dw; ++x) {
      const float fx = (x + 0.5f) * sx - 0.5f;
      const int x0 = std::clamp(static_cast<int>(fx), 0, sw - 1);
      const int x1 = std::min(x0 + 1, sw - 1);
      const float wx = std::clamp(fx - x0, 0.0f, 1.0f);
      float acc = 0.0f;
      for (int c = 0; c < channels; ++c) {
        const float v00 = src[(y0 * sw + x0) * channels + c];
        const float v01 = src[(y0 * sw + x1) * channels + c];
        const float v10 = src[(y1 * sw + x0) * channels + c];
        const float v11 = src[(y1 * sw + x1) * channels + c];
        acc += (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                v10 * wy * (1 - wx) + v11 * wy * wx);
      }
      dst[y * dw + x] = acc / channels;
    }
  }
}

}  // namespace

extern "C" {

void* feeder_create(int target_w, int target_h, int frame_cap, int imu_cap) {
  auto* f = new Feeder();
  f->target_w = target_w;
  f->target_h = target_h;
  f->frame_cap = static_cast<size_t>(frame_cap);
  f->imu_cap = static_cast<size_t>(imu_cap);
  return f;
}

void feeder_destroy(void* h) { delete static_cast<Feeder*>(h); }

// Returns 1 on success, 0 if the frame queue is full (lossless policy:
// caller should retry — mirrors RELIABLE QoS on the image topic).
int feeder_push_frame(void* h, double t, const uint8_t* data, int w, int hgt,
                      int channels) {
  auto* f = static_cast<Feeder*>(h);
  Frame fr;
  fr.t = t;
  fr.data.resize(static_cast<size_t>(f->target_w) * f->target_h);
  preprocess(data, w, hgt, channels, fr.data.data(), f->target_w,
             f->target_h);
  {
    std::lock_guard<std::mutex> lk(f->mu);
    if (f->frames.size() >= f->frame_cap) {
      ++f->dropped_frames;
      return 0;
    }
    f->frames.push_back(std::move(fr));
  }
  f->cv.notify_one();
  return 1;
}

// IMU pushes never block: drop-oldest (BEST_EFFORT QoS parity). NaN samples
// are rejected like the wrapper's validation (:355-360).
int feeder_push_imu(void* h, double t, const double* gyro,
                    const double* acc) {
  for (int i = 0; i < 3; ++i) {
    if (gyro[i] != gyro[i] || acc[i] != acc[i]) return 0;  // NaN reject
  }
  auto* f = static_cast<Feeder*>(h);
  std::lock_guard<std::mutex> lk(f->mu);
  if (f->imu.size() >= f->imu_cap) {
    f->imu.pop_front();
    ++f->dropped_imu;
  }
  ImuSample s;
  s.t = t;
  std::memcpy(s.gyro, gyro, sizeof(s.gyro));
  std::memcpy(s.acc, acc, sizeof(s.acc));
  f->imu.push_back(s);
  return 1;
}

// Pop the oldest frame plus all IMU samples in (t_prev, t_frame].
// imu_out layout: max_imu rows of [t, gx, gy, gz, ax, ay, az].
// Returns the number of IMU samples, or -1 if no frame is available.
int feeder_next(void* h, double* t_out, float* img_out, double* imu_out,
                int max_imu, int wait_ms) {
  auto* f = static_cast<Feeder*>(h);
  std::unique_lock<std::mutex> lk(f->mu);
  if (f->frames.empty() && wait_ms > 0) {
    f->cv.wait_for(lk, std::chrono::milliseconds(wait_ms),
                   [f] { return !f->frames.empty(); });
  }
  if (f->frames.empty()) return -1;
  Frame fr = std::move(f->frames.front());
  f->frames.pop_front();
  *t_out = fr.t;
  std::memcpy(img_out, fr.data.data(), fr.data.size() * sizeof(float));

  int n = 0;
  while (!f->imu.empty() && f->imu.front().t <= fr.t && n < max_imu) {
    const ImuSample& s = f->imu.front();
    if (s.t > f->last_popped_t) {
      imu_out[n * 7 + 0] = s.t;
      std::memcpy(imu_out + n * 7 + 1, s.gyro, sizeof(s.gyro));
      std::memcpy(imu_out + n * 7 + 4, s.acc, sizeof(s.acc));
      ++n;
    }
    f->imu.pop_front();
  }
  f->last_popped_t = fr.t;
  return n;
}

int feeder_pending_frames(void* h) {
  auto* f = static_cast<Feeder*>(h);
  std::lock_guard<std::mutex> lk(f->mu);
  return static_cast<int>(f->frames.size());
}

uint64_t feeder_dropped_imu(void* h) {
  auto* f = static_cast<Feeder*>(h);
  std::lock_guard<std::mutex> lk(f->mu);
  return f->dropped_imu;
}

uint64_t feeder_dropped_frames(void* h) {
  auto* f = static_cast<Feeder*>(h);
  std::lock_guard<std::mutex> lk(f->mu);
  return f->dropped_frames;
}

}  // extern "C"
