// sspl_io: native data-loading runtime for the TPU SLAM engine.
//
// Replaces the reference driver's image IO (cv::imread + cvtColor in
// Examples/Structure-SLAM.cc / Tracking.cc:145-161) with a TPU-friendly
// design: a background prefetch ring that decodes frames ahead of the
// device pipeline so HBM never waits on disk. Exposed to Python via a
// plain C ABI (ctypes) — no pybind11 dependency.
//
//   - PNG decode (8/16-bit gray, 8-bit RGB/RGBA, non-interlaced) via zlib
//   - PGM/PPM (binary) decode
//   - conversion to float32 grayscale in [0, 255] (Rec.601 luma)
//   - N-slot prefetch ring fed by worker threads, strict FIFO delivery
//
// Build: make -C native   (g++ -O3 -shared, links -lz -lpthread)

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

struct Image {
  int width = 0;
  int height = 0;
  std::vector<float> gray;  // H*W float32 in [0, 255]
  bool ok = false;
  std::string error;
};

// ------------------------------------------------------------------ PNG --
uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) |
         uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

Image decode_png(const std::vector<uint8_t>& buf) {
  Image out;
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (buf.size() < 8 || std::memcmp(buf.data(), sig, 8) != 0) {
    out.error = "not a png";
    return out;
  }
  size_t pos = 8;
  int width = 0, height = 0, bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= buf.size()) {
    uint32_t len = be32(&buf[pos]);
    if (pos + 12 + len > buf.size()) break;
    const char* type = reinterpret_cast<const char*>(&buf[pos + 4]);
    const uint8_t* data = &buf[pos + 8];
    if (std::memcmp(type, "IHDR", 4) == 0) {
      width = be32(data);
      height = be32(data + 4);
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data, data + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (width <= 0 || height <= 0) {
    out.error = "bad IHDR";
    return out;
  }
  if (interlace != 0) {
    out.error = "interlaced png unsupported";
    return out;
  }
  int channels;
  switch (color_type) {
    case 0: channels = 1; break;  // gray
    case 2: channels = 3; break;  // rgb
    case 4: channels = 2; break;  // gray+alpha
    case 6: channels = 4; break;  // rgba
    default:
      out.error = "palette png unsupported";
      return out;
  }
  if (bit_depth != 8 && !(bit_depth == 16 && color_type == 0)) {
    out.error = "unsupported bit depth";
    return out;
  }
  int bytes_per_sample = bit_depth / 8;
  size_t stride = size_t(width) * channels * bytes_per_sample;
  std::vector<uint8_t> raw((stride + 1) * height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK) {
    out.error = "zlib inflate failed";
    return out;
  }
  // undo per-scanline filters
  std::vector<uint8_t> img(stride * height);
  int bpp = channels * bytes_per_sample;
  for (int y = 0; y < height; ++y) {
    const uint8_t* src = &raw[size_t(y) * (stride + 1)];
    uint8_t filter = src[0];
    const uint8_t* line = src + 1;
    uint8_t* dst = &img[size_t(y) * stride];
    const uint8_t* prev = y > 0 ? &img[size_t(y - 1) * stride] : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
      int b = prev ? prev[x] : 0;
      int c = (prev && x >= size_t(bpp)) ? prev[x - bpp] : 0;
      int v = line[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default:
          out.error = "bad filter";
          return out;
      }
      dst[x] = uint8_t(v);
    }
  }
  // to float32 grayscale
  out.width = width;
  out.height = height;
  out.gray.resize(size_t(width) * height);
  for (int y = 0; y < height; ++y) {
    for (int x = 0; x < width; ++x) {
      const uint8_t* px = &img[(size_t(y) * width + x) * bpp];
      float g;
      if (color_type == 0) {
        g = bit_depth == 16 ? float((uint32_t(px[0]) << 8) | px[1]) / 257.0f
                            : float(px[0]);
      } else if (color_type == 4) {
        g = float(px[0]);
      } else {
        g = 0.299f * px[0] + 0.587f * px[1] + 0.114f * px[2];
      }
      out.gray[size_t(y) * width + x] = g;
    }
  }
  out.ok = true;
  return out;
}

// ------------------------------------------------------------- PGM/PPM --
Image decode_pnm(const std::vector<uint8_t>& buf) {
  Image out;
  if (buf.size() < 2 || buf[0] != 'P' || (buf[1] != '5' && buf[1] != '6')) {
    out.error = "not pnm";
    return out;
  }
  bool color = buf[1] == '6';
  size_t pos = 2;
  auto next_int = [&]() -> long {
    while (pos < buf.size()) {
      if (buf[pos] == '#') {
        while (pos < buf.size() && buf[pos] != '\n') ++pos;
      } else if (isspace(buf[pos])) {
        ++pos;
      } else {
        break;
      }
    }
    long v = 0;
    while (pos < buf.size() && isdigit(buf[pos])) v = v * 10 + (buf[pos++] - '0');
    return v;
  };
  long w = next_int(), h = next_int(), maxv = next_int();
  ++pos;  // single whitespace after maxval
  if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) {
    out.error = "bad pnm header";
    return out;
  }
  size_t need = size_t(w) * h * (color ? 3 : 1);
  if (buf.size() - pos < need) {
    out.error = "truncated pnm";
    return out;
  }
  out.width = int(w);
  out.height = int(h);
  out.gray.resize(size_t(w) * h);
  const uint8_t* p = &buf[pos];
  for (size_t i = 0; i < size_t(w) * h; ++i) {
    if (color) {
      out.gray[i] = 0.299f * p[3 * i] + 0.587f * p[3 * i + 1] + 0.114f * p[3 * i + 2];
    } else {
      out.gray[i] = float(p[i]);
    }
  }
  out.ok = true;
  return out;
}

Image load_file(const std::string& path) {
  Image out;
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) {
    out.error = "open failed: " + path;
    return out;
  }
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)n);
  size_t got = std::fread(buf.data(), 1, size_t(n), f);
  std::fclose(f);
  if (got != size_t(n)) {
    out.error = "short read";
    return out;
  }
  if (n >= 8 && buf[0] == 137 && buf[1] == 'P') return decode_png(buf);
  if (n >= 2 && buf[0] == 'P') return decode_pnm(buf);
  out.error = "unknown format";
  return out;
}

// --------------------------------------------------------- prefetcher --
struct Prefetcher {
  std::vector<std::string> paths;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::vector<Image> slots;      // indexed by frame % capacity
  std::vector<int> slot_frame;   // which frame each slot holds (-1 empty)
  std::atomic<int> next_to_fetch{0};
  int next_to_deliver = 0;
  size_t capacity = 0;
  bool stop = false;

  void worker() {
    for (;;) {
      int frame = next_to_fetch.fetch_add(1);
      if (frame >= int(paths.size())) return;
      Image im = load_file(paths[frame]);
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] {
        return stop || frame < next_to_deliver + int(capacity);
      });
      if (stop) return;
      size_t s = size_t(frame) % capacity;
      slots[s] = std::move(im);
      slot_frame[s] = frame;
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// one-shot synchronous load; returns 0 on success.
// caller passes a float buffer of max_pixels; actual dims written out.
int sspl_load_image(const char* path, float* out, int max_pixels, int* out_w,
                    int* out_h) {
  Image im = load_file(path);
  if (!im.ok) return -1;
  if (im.width * im.height > max_pixels) return -2;
  std::memcpy(out, im.gray.data(), im.gray.size() * sizeof(float));
  *out_w = im.width;
  *out_h = im.height;
  return 0;
}

void* sspl_prefetch_start(const char** paths, int n_paths, int n_threads,
                          int ring_capacity) {
  auto* p = new Prefetcher();
  p->paths.assign(paths, paths + n_paths);
  p->capacity = size_t(ring_capacity > 0 ? ring_capacity : 8);
  p->slots.resize(p->capacity);
  p->slot_frame.assign(p->capacity, -1);
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i) p->workers.emplace_back(&Prefetcher::worker, p);
  return p;
}

// blocks until the next frame (strict order) is decoded; returns frame
// index or -1 when the sequence is exhausted / -2 on decode error.
int sspl_prefetch_next(void* handle, float* out, int max_pixels, int* out_w,
                       int* out_h) {
  auto* p = static_cast<Prefetcher*>(handle);
  int frame = p->next_to_deliver;
  if (frame >= int(p->paths.size())) return -1;
  size_t s = size_t(frame) % p->capacity;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_ready.wait(lk, [&] { return p->slot_frame[s] == frame; });
  Image im = std::move(p->slots[s]);
  p->slot_frame[s] = -1;
  p->next_to_deliver = frame + 1;
  p->cv_space.notify_all();
  lk.unlock();
  if (!im.ok) return -2;
  if (im.width * im.height > max_pixels) return -2;
  std::memcpy(out, im.gray.data(), im.gray.size() * sizeof(float));
  *out_w = im.width;
  *out_h = im.height;
  return frame;
}

void sspl_prefetch_stop(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv_space.notify_all();
  p->cv_ready.notify_all();
  // let workers drain the atomic counter
  p->next_to_fetch.store(int(p->paths.size()));
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
