// Native wav IO + batch assembly for the input pipeline hot path.
//
// The reference delegates wav reads to libsndfile via python soundfile
// (lrs2datamodule.py:139-146) inside torch DataLoader worker *processes*.
// On a TPU host the input pipeline is pure host work; this library does the
// per-batch fan-out in C++ threads instead (no GIL, no process forks):
// parse RIFF header once per file, pread() exactly the cropped window,
// convert PCM to float32 into the caller's pre-allocated batch buffer.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image):
//   wavio_read_window(path, start, count, out)         -> frames read or <0
//   wavio_read_batch(paths[], starts[], counts[], n, out, stride, n_threads)
//   wavio_num_frames(path)
//
// Supports PCM16/24/32 and IEEE float32 mono-or-first-channel wavs.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

namespace {

struct WavInfo {
  uint16_t format = 0;        // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint16_t bits = 0;
  int64_t data_offset = 0;    // byte offset of sample data
  int64_t data_bytes = 0;
};

bool parse_header(int fd, WavInfo* info) {
  uint8_t hdr[12];
  if (pread(fd, hdr, 12, 0) != 12) return false;
  if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0)
    return false;
  int64_t off = 12;
  while (true) {
    uint8_t chunk[8];
    if (pread(fd, chunk, 8, off) != 8) return false;
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (memcmp(chunk, "fmt ", 4) == 0) {
      uint8_t fmt[16];
      if (pread(fd, fmt, 16, off + 8) != 16) return false;
      memcpy(&info->format, fmt + 0, 2);
      memcpy(&info->channels, fmt + 2, 2);
      memcpy(&info->bits, fmt + 14, 2);
    } else if (memcmp(chunk, "data", 4) == 0) {
      info->data_offset = off + 8;
      info->data_bytes = size;
      return info->format != 0 && info->channels > 0 && info->bits > 0;
    }
    off += 8 + size + (size & 1);  // chunks are word-aligned
  }
}

// Read `count` frames starting at frame `start`, first channel, as float32.
int64_t read_window(const char* path, int64_t start, int64_t count,
                    float* out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  WavInfo info;
  if (!parse_header(fd, &info)) {
    close(fd);
    return -2;
  }
  const int bytes_per = info.bits / 8;
  const int64_t frame_bytes = (int64_t)bytes_per * info.channels;
  const int64_t total_frames = info.data_bytes / frame_bytes;
  if (count < 0 || start + count > total_frames) count = total_frames - start;
  if (count <= 0) {
    close(fd);
    return 0;
  }
  std::vector<uint8_t> raw((size_t)(count * frame_bytes));
  int64_t got = pread(fd, raw.data(), raw.size(),
                      info.data_offset + start * frame_bytes);
  close(fd);
  if (got < 0) return -3;
  int64_t frames = got / frame_bytes;
  const uint8_t* p = raw.data();
  if (info.format == 3 && info.bits == 32) {
    for (int64_t i = 0; i < frames; ++i)
      memcpy(&out[i], p + i * frame_bytes, 4);
  } else if (info.format == 1 && info.bits == 16) {
    for (int64_t i = 0; i < frames; ++i) {
      int16_t v;
      memcpy(&v, p + i * frame_bytes, 2);
      out[i] = (float)v / 32768.0f;
    }
  } else if (info.format == 1 && info.bits == 32) {
    for (int64_t i = 0; i < frames; ++i) {
      int32_t v;
      memcpy(&v, p + i * frame_bytes, 4);
      out[i] = (float)v / 2147483648.0f;
    }
  } else if (info.format == 1 && info.bits == 24) {
    for (int64_t i = 0; i < frames; ++i) {
      const uint8_t* b = p + i * frame_bytes;
      int32_t v = (b[0] << 8) | (b[1] << 16) | ((int32_t)(int8_t)b[2] << 24);
      out[i] = (float)v / 2147483648.0f;
    }
  } else {
    return -4;
  }
  return frames;
}

}  // namespace

extern "C" {

int64_t wavio_read_window(const char* path, int64_t start, int64_t count,
                          float* out) {
  return read_window(path, start, count, out);
}

int64_t wavio_num_frames(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  WavInfo info;
  if (!parse_header(fd, &info)) {
    close(fd);
    return -2;
  }
  close(fd);
  return info.data_bytes / ((int64_t)(info.bits / 8) * info.channels);
}

// Read n windows in parallel into out[i * out_stride ...].
// Returns the number of failed reads (0 = all good).
int64_t wavio_read_batch(const char** paths, const int64_t* starts,
                         const int64_t* counts, int64_t n, float* out,
                         int64_t out_stride, int64_t n_threads) {
  if (n_threads <= 0) n_threads = 4;
  std::atomic<int64_t> next(0), failures(0);
  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n) return;
      int64_t got =
          read_window(paths[i], starts[i], counts[i], out + i * out_stride);
      if (got < counts[i]) {
        if (got < 0) {
          failures.fetch_add(1);
          got = 0;
        }
        // zero-fill any shortfall so batches stay well-defined
        memset(out + i * out_stride + got, 0,
               (size_t)(counts[i] - got) * sizeof(float));
      }
    }
  };
  std::vector<std::thread> threads;
  int64_t nt = n_threads < n ? n_threads : n;
  for (int64_t t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
