// NiftyMatch-TPU native data loader.
//
// C++ runtime component (the reference's runtime layer is C++/CUDA —
// src/gpu/utils/ — ours is C++ around a JAX compute core): a dependency-free
// PNG decoder (zlib only) plus a multi-threaded prefetching frame loader, so
// host-side image decode overlaps TPU compute instead of serialising the
// SLAM frame loop.
//
// Exposed C API (ctypes-friendly, see niftymatch_tpu/data/native_loader.py):
//   nm_png_info(path, &w, &h, &channels, &bitdepth) -> 0 on success
//   nm_png_read_gray(path, float* out)   // HxW float32, reference grayscale
//                                        // weights 0.21R + 0.72G + 0.07B
//                                        // (bgra_2_gray.cu:16 convention)
//   nm_png_read_raw16(path, uint16_t* out) // for 16-bit depth maps (TUM)
//   nm_loader_create(paths[], n, threads) -> handle
//   nm_loader_next(handle, float* out, &w, &h) -> index or -1 at end
//   nm_loader_destroy(handle)

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Png {
  uint32_t w = 0, h = 0;
  int bitdepth = 0;
  int color_type = 0;  // 0 gray, 2 rgb, 4 gray+a, 6 rgba
  int channels = 0;
  std::vector<uint8_t> pixels;  // de-filtered, bytes_per_px * w * h
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.resize(size_t(n));
  size_t got = std::fread(out.data(), 1, size_t(n), f);
  std::fclose(f);
  return got == size_t(n);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode an 8/16-bit non-interlaced PNG of color type 0/2/4/6.
bool decode_png(const char* path, Png& png) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf) || buf.size() < 45) return false;
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (std::memcmp(buf.data(), sig, 8) != 0) return false;

  std::vector<uint8_t> idat;
  size_t off = 8;
  int interlace = 0;
  while (off + 12 <= buf.size()) {
    uint32_t len = be32(&buf[off]);
    const uint8_t* type = &buf[off + 4];
    const uint8_t* data = &buf[off + 8];
    if (off + 12 + len > buf.size()) return false;
    if (!std::memcmp(type, "IHDR", 4)) {
      if (len < 13) return false;
      png.w = be32(data);
      png.h = be32(data + 4);
      png.bitdepth = data[8];
      png.color_type = data[9];
      interlace = data[12];
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    off += 12 + len;
  }
  if (png.w == 0 || png.h == 0 || interlace != 0) return false;
  if (png.bitdepth != 8 && png.bitdepth != 16) return false;
  switch (png.color_type) {
    case 0: png.channels = 1; break;
    case 2: png.channels = 3; break;
    case 4: png.channels = 2; break;
    case 6: png.channels = 4; break;
    default: return false;
  }

  const size_t bpp = size_t(png.channels) * (png.bitdepth / 8);
  const size_t stride = bpp * png.w;
  std::vector<uint8_t> raw((stride + 1) * png.h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    return false;
  }

  png.pixels.assign(stride * png.h, 0);
  const uint8_t* prev = nullptr;
  for (uint32_t y = 0; y < png.h; ++y) {
    const uint8_t* src = &raw[(stride + 1) * y];
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = &png.pixels[stride * y];
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= bpp ? dst[x - bpp] : 0;
      int b = prev ? prev[x] : 0;
      int c = (prev && x >= bpp) ? prev[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      dst[x] = uint8_t(v & 0xff);
    }
    prev = dst;
  }
  return true;
}

// Reference grayscale weights: 0.07 B + 0.72 G + 0.21 R (bgra_2_gray.cu:16).
void to_gray_f32(const Png& png, float* out) {
  const int step = png.bitdepth / 8;
  const size_t n = size_t(png.w) * png.h;
  const uint8_t* p = png.pixels.data();
  auto sample = [&](size_t base) -> float {
    if (step == 1) return float(p[base]);
    return float((uint32_t(p[base]) << 8 | p[base + 1]) >> 8);  // take hi byte
  };
  for (size_t i = 0; i < n; ++i) {
    size_t base = i * size_t(png.channels) * step;
    float v;
    if (png.channels <= 2) {
      v = sample(base);
    } else {
      float r = sample(base);
      float g = sample(base + step);
      float b = sample(base + 2 * step);
      v = 0.21f * r + 0.72f * g + 0.07f * b;
    }
    out[i] = v;
  }
}

struct Loader {
  std::vector<std::string> paths;
  std::atomic<size_t> next_fetch{0};
  size_t next_emit = 0;
  struct Slot {
    bool ready = false;
    bool ok = false;
    uint32_t w = 0, h = 0;
    std::vector<float> data;
  };
  std::vector<Slot> slots;
  std::mutex mu;
  std::condition_variable cv;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  void worker() {
    for (;;) {
      size_t i = next_fetch.fetch_add(1);
      if (i >= paths.size() || stop.load()) return;
      Png png;
      bool ok = decode_png(paths[i].c_str(), png);
      Slot slot;
      slot.ok = ok;
      if (ok) {
        slot.w = png.w;
        slot.h = png.h;
        slot.data.resize(size_t(png.w) * png.h);
        to_gray_f32(png, slot.data.data());
      }
      slot.ready = true;
      {
        std::lock_guard<std::mutex> lk(mu);
        slots[i] = std::move(slot);
      }
      cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

int nm_png_info(const char* path, int* w, int* h, int* channels,
                int* bitdepth) {
  Png png;
  if (!decode_png(path, png)) return -1;
  *w = int(png.w);
  *h = int(png.h);
  *channels = png.channels;
  *bitdepth = png.bitdepth;
  return 0;
}

int nm_png_read_gray(const char* path, float* out) {
  Png png;
  if (!decode_png(path, png)) return -1;
  to_gray_f32(png, out);
  return 0;
}

int nm_png_read_raw16(const char* path, uint16_t* out) {
  Png png;
  if (!decode_png(path, png)) return -1;
  if (png.channels != 1 || png.bitdepth != 16) return -2;
  const uint8_t* p = png.pixels.data();
  const size_t n = size_t(png.w) * png.h;
  for (size_t i = 0; i < n; ++i) {
    out[i] = uint16_t((uint32_t(p[2 * i]) << 8) | p[2 * i + 1]);
  }
  return 0;
}

void* nm_loader_create(const char** paths, int n, int threads) {
  auto* ld = new Loader();
  ld->paths.assign(paths, paths + n);
  ld->slots.resize(size_t(n));
  int t = threads > 0 ? threads : 2;
  for (int i = 0; i < t; ++i) {
    ld->workers.emplace_back([ld] { ld->worker(); });
  }
  return ld;
}

// Blocks until frame ``next_emit`` is decoded; copies into out (caller
// allocates ``capacity`` floats).  Returns the frame index, -1 when the
// sequence is exhausted, -2 on decode failure, -3 if out is too small.
int nm_loader_next(void* handle, float* out, long capacity, int* w,
                   int* h) {
  auto* ld = static_cast<Loader*>(handle);
  if (ld->next_emit >= ld->paths.size()) return -1;
  size_t i = ld->next_emit++;
  std::unique_lock<std::mutex> lk(ld->mu);
  ld->cv.wait(lk, [&] { return ld->slots[i].ready; });
  auto& slot = ld->slots[i];
  if (!slot.ok) return -2;
  if (long(slot.data.size()) > capacity) return -3;
  *w = int(slot.w);
  *h = int(slot.h);
  std::memcpy(out, slot.data.data(), slot.data.size() * sizeof(float));
  slot.data.clear();
  slot.data.shrink_to_fit();
  return int(i);
}

void nm_loader_destroy(void* handle) {
  auto* ld = static_cast<Loader*>(handle);
  ld->stop.store(true);
  ld->next_fetch.store(ld->paths.size());
  for (auto& t : ld->workers) t.join();
  delete ld;
}

}  // extern "C"
