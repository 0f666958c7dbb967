// Native ingest engine: persistent-thread-pool JPEG decode + crop/resize.
//
// This is the C++ core of the TPU-native replacement for the reference's
// FFCV data path (ref examples/randomlabel.py:72-78 omega.ffcv.train_reader;
// FFCV itself is Cython/C + libturbojpeg). One call decodes a whole batch of
// JPEG files into a caller-provided [N, S, S, 3] uint8 NHWC buffer:
//
//   * decode uses libjpeg DCT scaling (1/2, 1/4, 1/8) to avoid full-res
//     IDCTs when the target crop is small — the same trick FFCV's
//     ResizedCropRGBImageDecoder uses;
//   * train mode applies torchvision-semantics RandomResizedCrop (scale
//     floor 0.35, FFCV's default) with a deterministic splitmix64 stream
//     keyed by (seed, epoch, index); val mode resizes the shorter side to
//     size/ratio and center-crops (ref omega.transforms val pipeline);
//   * per-image status codes let the Python side fall back to OpenCV for
//     non-JPEG/corrupt files instead of failing the batch.
//
// Exposed as a tiny extern "C" surface consumed via ctypes
// (noise_robust_vit_tpu/train/native.py) — no pybind11 dependency.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ------------------------------------------------------------------ errors
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// ------------------------------------------------------------------ rng
// splitmix64: deterministic per-(seed, epoch, index) stream, the native
// counterpart of the Python path's per-index default_rng (exact numpy PCG64
// parity is not attempted; determinism given the key is the contract).
struct SplitMix64 {
  uint64_t state;
  explicit SplitMix64(uint64_t s) : state(s) {}
  uint64_t next() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  double uniform() {  // [0, 1)
    return (next() >> 11) * (1.0 / 9007199254740992.0);
  }
  int64_t randint(int64_t lo, int64_t hi) {  // [lo, hi] inclusive
    return lo + static_cast<int64_t>(uniform() * static_cast<double>(hi - lo + 1));
  }
};

// ------------------------------------------------------------------ resize
// Bilinear, half-pixel-center convention (matches cv2 INTER_LINEAR / jnp
// "linear" with antialias off for downscales close to 1; the device-side
// augment stage owns everything past the geometry).
void bilinear_resize(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    if (y0 > sh - 2) y0 = sh - 2;
    if (y0 < 0) y0 = 0;
    double wy = fy - y0;
    if (sh == 1) { y0 = 0; wy = 0; }
    for (int x = 0; x < dw; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      if (x0 > sw - 2) x0 = sw - 2;
      if (x0 < 0) x0 = 0;
      double wx = fx - x0;
      if (sw == 1) { x0 = 0; wx = 0; }
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * sw + x0) * 3;
      const uint8_t* p01 = p00 + (sw > 1 ? 3 : 0);
      const uint8_t* p10 = p00 + (sh > 1 ? static_cast<size_t>(sw) * 3 : 0);
      const uint8_t* p11 = p10 + (sw > 1 ? 3 : 0);
      uint8_t* out = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        double top = p00[c] + (p01[c] - p00[c]) * wx;
        double bot = p10[c] + (p11[c] - p10[c]) * wx;
        double v = top + (bot - top) * wy;
        out[c] = static_cast<uint8_t>(v + 0.5);
      }
    }
  }
}

// ------------------------------------------------------------------ decode
// Reads header only to learn (w, h); returns 0 on success.
int jpeg_dims(const uint8_t* buf, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode at 1/denom DCT scale into an RGB buffer (resized to out_w×out_h by
// libjpeg itself). Returns 0 on success.
int jpeg_decode_scaled(const uint8_t* buf, size_t len, int denom,
                       std::vector<uint8_t>* out, int* out_w, int* out_h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  cinfo.dct_method = JDCT_ISLOW;
  jpeg_start_decompress(&cinfo);
  *out_w = cinfo.output_width;
  *out_h = cinfo.output_height;
  out->resize(static_cast<size_t>(*out_w) * *out_h * 3);
  JSAMPROW row;
  while (cinfo.output_scanline < cinfo.output_height) {
    row = out->data() + static_cast<size_t>(cinfo.output_scanline) * *out_w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int pick_denom(int short_side, int needed) {
  // largest DCT downscale keeping the relevant extent >= needed
  for (int d : {8, 4, 2}) {
    if (short_side / d >= needed) return d;
  }
  return 1;
}

// ------------------------------------------------------------------ work
struct Task {
  const char* path;
  int64_t index;
  uint8_t* out;   // [size, size, 3]
  int size;
  int train;
  uint64_t key;   // rng key for this image
  int32_t* status;
};

int read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n <= 0) {
    std::fclose(f);
    return 1;
  }
  std::fseek(f, 0, SEEK_SET);
  buf->resize(static_cast<size_t>(n));
  size_t got = std::fread(buf->data(), 1, static_cast<size_t>(n), f);
  std::fclose(f);
  return got == static_cast<size_t>(n) ? 0 : 1;
}

void crop_resize(const std::vector<uint8_t>& img, int w, int h, int x0, int y0,
                 int cw, int ch, uint8_t* out, int size) {
  // contiguous copy of the crop, then bilinear to size×size
  std::vector<uint8_t> crop(static_cast<size_t>(cw) * ch * 3);
  for (int y = 0; y < ch; ++y) {
    std::memcpy(crop.data() + static_cast<size_t>(y) * cw * 3,
                img.data() + ((static_cast<size_t>(y0) + y) * w + x0) * 3,
                static_cast<size_t>(cw) * 3);
  }
  bilinear_resize(crop.data(), ch, cw, out, size, size);
}

void process_one(const Task& t) {
  std::vector<uint8_t> file;
  if (read_file(t.path, &file)) {
    *t.status = 1;
    return;
  }
  int fw = 0, fh = 0;
  if (jpeg_dims(file.data(), file.size(), &fw, &fh) || fw < 1 || fh < 1) {
    *t.status = 2;  // not a (readable) JPEG — caller falls back
    return;
  }
  const int S = t.size;
  std::vector<uint8_t> img;
  int w = 0, h = 0;
  if (t.train) {
    // RandomResizedCrop box in FULL-RES coordinates (torchvision semantics,
    // scale floor 0.35 per FFCV default; mirrors the Python fallback path)
    SplitMix64 rng(t.key);
    double area = static_cast<double>(fw) * fh;
    int cw = 0, ch = 0, x0 = 0, y0 = 0;
    bool ok = false;
    for (int attempt = 0; attempt < 10 && !ok; ++attempt) {
      double target = area * (0.35 + rng.uniform() * (1.0 - 0.35));
      double log_lo = std::log(3.0 / 4.0), log_hi = std::log(4.0 / 3.0);
      double ar = std::exp(log_lo + rng.uniform() * (log_hi - log_lo));
      cw = static_cast<int>(std::lround(std::sqrt(target * ar)));
      ch = static_cast<int>(std::lround(std::sqrt(target / ar)));
      if (cw > 0 && cw <= fw && ch > 0 && ch <= fh) {
        y0 = static_cast<int>(rng.randint(0, fh - ch));
        x0 = static_cast<int>(rng.randint(0, fw - cw));
        ok = true;
      }
    }
    if (!ok) {  // center-crop fallback, same as the Python path
      int short_side = fw < fh ? fw : fh;
      cw = ch = short_side;
      x0 = (fw - cw) / 2;
      y0 = (fh - ch) / 2;
    }
    int denom = pick_denom(cw < ch ? cw : ch, S);
    if (jpeg_decode_scaled(file.data(), file.size(), denom, &img, &w, &h)) {
      *t.status = 2;
      return;
    }
    // scale box into decoded coordinates (output dims are ceil(full/denom))
    double rx = static_cast<double>(w) / fw, ry = static_cast<double>(h) / fh;
    int sx = static_cast<int>(x0 * rx), sy = static_cast<int>(y0 * ry);
    int scw = static_cast<int>(cw * rx), sch = static_cast<int>(ch * ry);
    if (scw < 1) scw = 1;
    if (sch < 1) sch = 1;
    if (sx + scw > w) sx = w - scw;
    if (sy + sch > h) sy = h - sch;
    if (sx < 0) sx = 0;
    if (sy < 0) sy = 0;
    crop_resize(img, w, h, sx, sy, scw, sch, t.out, S);
  } else {
    // val: resize shorter side to S/ratio (ratio = 224/256), center-crop S
    const double ratio = 224.0 / 256.0;
    int needed = static_cast<int>(std::lround(S / ratio));
    int short_side = fw < fh ? fw : fh;
    int denom = pick_denom(short_side, needed);
    if (jpeg_decode_scaled(file.data(), file.size(), denom, &img, &w, &h)) {
      *t.status = 2;
      return;
    }
    int sshort = w < h ? w : h;
    double scale = static_cast<double>(needed) / sshort;
    int nw = static_cast<int>(std::lround(w * scale));
    int nh = static_cast<int>(std::lround(h * scale));
    if (nw < S) nw = S;
    if (nh < S) nh = S;
    std::vector<uint8_t> resized(static_cast<size_t>(nw) * nh * 3);
    bilinear_resize(img.data(), h, w, resized.data(), nh, nw);
    int x0 = (nw - S) / 2, y0 = (nh - S) / 2;
    for (int y = 0; y < S; ++y) {
      std::memcpy(t.out + static_cast<size_t>(y) * S * 3,
                  resized.data() + ((static_cast<size_t>(y0) + y) * nw + x0) * 3,
                  static_cast<size_t>(S) * 3);
    }
  }
  *t.status = 0;
}

// ------------------------------------------------------------------ pool
struct Pool {
  std::vector<std::thread> threads;
  std::queue<Task> tasks;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  std::atomic<int> pending{0};
  bool stop = false;

  explicit Pool(int n) {
    for (int i = 0; i < n; ++i) {
      threads.emplace_back([this] { worker(); });
    }
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_work.notify_all();
    for (auto& t : threads) t.join();
  }

  void worker() {
    for (;;) {
      Task t;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [this] { return stop || !tasks.empty(); });
        if (stop && tasks.empty()) return;
        t = tasks.front();
        tasks.pop();
      }
      process_one(t);
      if (pending.fetch_sub(1) == 1) cv_done.notify_all();
    }
  }

  void run_batch(std::vector<Task>&& batch) {
    pending.fetch_add(static_cast<int>(batch.size()));
    {
      std::lock_guard<std::mutex> lk(mu);
      for (auto& t : batch) tasks.push(t);
    }
    cv_work.notify_all();
    std::unique_lock<std::mutex> lk(mu);
    cv_done.wait(lk, [this] { return pending.load() == 0; });
  }
};

}  // namespace

extern "C" {

void* ingest_create(int num_threads) {
  if (num_threads < 1) num_threads = 1;
  return new Pool(num_threads);
}

void ingest_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// Decode n JPEGs into out [n, size, size, 3] uint8 NHWC. status[i]: 0 ok,
// 1 unreadable file, 2 not-a-JPEG/corrupt (caller falls back per image).
// keys[i] seeds the per-image RandomResizedCrop stream (train != 0).
void ingest_decode_batch(void* pool, const char** paths, int64_t n,
                         uint8_t* out, int size, int train,
                         const uint64_t* keys, int32_t* status) {
  std::vector<Task> batch;
  batch.reserve(static_cast<size_t>(n));
  const size_t stride = static_cast<size_t>(size) * size * 3;
  for (int64_t i = 0; i < n; ++i) {
    batch.push_back(Task{paths[i], i, out + stride * i, size, train,
                         keys ? keys[i] : 0, status + i});
  }
  static_cast<Pool*>(pool)->run_batch(std::move(batch));
}

}  // extern "C"
