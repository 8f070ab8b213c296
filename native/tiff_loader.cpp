// Native data-loader: multithreaded TIFF batch decoder.
//
// The reference framework's end-to-end throughput was bottlenecked by
// single-threaded per-frame TIFF decode on the host (~205 frames/s;
// reference deep-calcium nf.py:126-130, BASELINE.md). This library decodes a
// batch of grayscale TIFF frames into one contiguous int16 buffer using a
// thread pool, feeding the device-resident summary/segmentation pipelines.
//
// Exposed C ABI (ctypes-friendly):
//   dc_tiff_size(path, &h, &w)                    -> 0 ok / <0 error
//   dc_decode_tiff_batch(paths, n, out, h, w,
//                        nthreads, status)        -> number of failed frames
//
// Per-frame failures (missing/corrupt files) zero-fill that frame and set
// status[i] = 1 — mirroring the reference's corrupted-TIFF tolerance
// (unet2ds_sj.py:75-82) without aborting the batch.
//
// Supported on-disk formats: uncompressed or compressed grayscale TIFF with
// 8/16/32-bit integer samples (libtiff handles the codec); values are cast
// to int16 (the HDF5 contract dtype, nf.py:121).

#include <tiffio.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// libtiff is noisy on warnings (e.g. unknown tags); silence handlers
// per-process. Errors are surfaced through return codes instead.
struct SilenceLibtiff {
  SilenceLibtiff() {
    TIFFSetWarningHandler(nullptr);
    TIFFSetErrorHandler(nullptr);
  }
};
SilenceLibtiff silence_once;

// Decode one grayscale TIFF into out[h*w] as int16. Returns 0 on success.
int decode_one(const char* path, int16_t* out, int height, int width) {
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return -1;

  uint32_t h = 0, w = 0;
  uint16_t bits = 0, samples = 1, fmt = SAMPLEFORMAT_UINT;
  TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &h);
  TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &w);
  TIFFGetField(tif, TIFFTAG_BITSPERSAMPLE, &bits);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLESPERPIXEL, &samples);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLEFORMAT, &fmt);

  if ((int)h != height || (int)w != width || samples != 1 ||
      (bits != 8 && bits != 16 && bits != 32)) {
    TIFFClose(tif);
    return -2;
  }

  const tmsize_t scanline = TIFFScanlineSize(tif);
  std::vector<uint8_t> row(scanline);
  for (uint32_t y = 0; y < h; ++y) {
    if (TIFFReadScanline(tif, row.data(), y) < 0) {
      TIFFClose(tif);
      return -3;
    }
    int16_t* dst = out + (size_t)y * width;
    if (bits == 8) {
      const uint8_t* src = row.data();
      for (uint32_t x = 0; x < w; ++x) dst[x] = (int16_t)src[x];
    } else if (bits == 16) {
      const uint16_t* src = (const uint16_t*)row.data();
      for (uint32_t x = 0; x < w; ++x) dst[x] = (int16_t)src[x];
    } else {  // 32-bit int (PIL mode "I") or float
      if (fmt == SAMPLEFORMAT_IEEEFP) {
        const float* src = (const float*)row.data();
        // Clamp before the cast: float->int16 outside [-32768, 32767] is
        // undefined behavior in C++ (silently corrupt pixels on a bright
        // frame, with status 0). NaN maps to 0.
        for (uint32_t x = 0; x < w; ++x) {
          float v = src[x];
          if (!(v == v)) v = 0.0f;                     // NaN
          if (v > 32767.0f) v = 32767.0f;
          if (v < -32768.0f) v = -32768.0f;
          dst[x] = (int16_t)v;
        }
      } else {
        const int32_t* src = (const int32_t*)row.data();
        for (uint32_t x = 0; x < w; ++x) dst[x] = (int16_t)src[x];
      }
    }
  }
  TIFFClose(tif);
  return 0;
}

}  // namespace

extern "C" {

int dc_tiff_size(const char* path, int* h, int* w) {
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return -1;
  uint32_t th = 0, tw = 0;
  TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &th);
  TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &tw);
  TIFFClose(tif);
  *h = (int)th;
  *w = (int)tw;
  return (th && tw) ? 0 : -2;
}

// Decode n frames into out (n*h*w int16, C-contiguous). status must hold n
// bytes; status[i]=0 ok, 1 failed (frame zero-filled). Returns #failures.
int dc_decode_tiff_batch(const char** paths, int n, int16_t* out, int height,
                         int width, int nthreads, uint8_t* status) {
  if (nthreads < 1) nthreads = 1;
  std::atomic<int> next(0), failures(0);
  const size_t frame_px = (size_t)height * width;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      int16_t* dst = out + (size_t)i * frame_px;
      const int rc = decode_one(paths[i], dst, height, width);
      if (rc != 0) {
        std::memset(dst, 0, frame_px * sizeof(int16_t));
        status[i] = 1;
        failures.fetch_add(1);
      } else {
        status[i] = 0;
      }
    }
  };

  std::vector<std::thread> pool;
  const int nt = nthreads > n ? n : nthreads;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
