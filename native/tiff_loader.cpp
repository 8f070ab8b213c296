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
// Per-frame failures (missing/corrupt/unsupported files) zero-fill that
// frame and set status[i] = 1; the Python caller (_ingest.decode_chunk)
// retries flagged frames on the PIL tier before declaring them corrupt —
// mirroring the reference's corrupted-TIFF tolerance (unet2ds_sj.py:75-82)
// without aborting the batch, and without silently mis-decoding layouts
// this fast path does not handle.
//
// Supported on-disk formats: uncompressed or compressed grayscale TIFF,
// stripped or tiled, with 8/16/32-bit integer or 32-bit float samples
// (libtiff handles the codec); values are cast to int16 (the HDF5 contract
// dtype, nf.py:121). 16-bit half-float samples are REJECTED (status flag),
// not reinterpreted as uint16 garbage.
//
// No exception may escape the extern "C" boundary into ctypes (undefined
// behavior that in practice aborts the interpreter): per-frame decode is
// wrapped in a catch-all, and the pool spawn tolerates thread-creation
// failure by having the calling thread work the same queue.

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

// Convert one run of `count` samples at `src` into int16 at `dst`.
// Shared by the strip and tile paths so the two cannot diverge.
void convert_run(const uint8_t* src, int16_t* dst, uint32_t count,
                 uint16_t bits, uint16_t fmt) {
  if (bits == 8) {
    if (fmt == SAMPLEFORMAT_INT) {
      const int8_t* s = (const int8_t*)src;  // -1 must stay -1, not 255
      for (uint32_t x = 0; x < count; ++x) dst[x] = (int16_t)s[x];
    } else {
      for (uint32_t x = 0; x < count; ++x) dst[x] = (int16_t)src[x];
    }
  } else if (bits == 16) {
    // UINT and INT alike: the contract is the reference's .astype(np.int16)
    // bit reinterpretation (nf.py:121). IEEEFP was rejected up front.
    std::memcpy(dst, src, (size_t)count * sizeof(int16_t));
  } else {  // 32-bit int (PIL mode "I") or float
    if (fmt == SAMPLEFORMAT_IEEEFP) {
      const float* s = (const float*)src;
      // Clamp before the cast: float->int16 outside [-32768, 32767] is
      // undefined behavior in C++ (silently corrupt pixels on a bright
      // frame, with status 0). NaN maps to 0.
      for (uint32_t x = 0; x < count; ++x) {
        float v = s[x];
        if (!(v == v)) v = 0.0f;                     // NaN
        if (v > 32767.0f) v = 32767.0f;
        if (v < -32768.0f) v = -32768.0f;
        dst[x] = (int16_t)v;
      }
    } else {
      const int32_t* s = (const int32_t*)src;
      for (uint32_t x = 0; x < count; ++x) dst[x] = (int16_t)s[x];
    }
  }
}

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
  if (bits == 16 && fmt == SAMPLEFORMAT_IEEEFP) {
    // Half-float samples: reinterpreting the bit patterns as uint16 would
    // fill the frame with large-magnitude garbage under status 0. Flag it
    // instead (the PIL tier cannot read these either; the frame is
    // zero-filled WITH a warning, never silently corrupted).
    TIFFClose(tif);
    return -5;
  }

  if (TIFFIsTiled(tif)) {
    // Tiled layout (modern acquisition software emits these; libtiff
    // refuses TIFFReadScanline on them). Decode tile-by-tile and copy the
    // in-bounds window of each into the row-major frame.
    uint32_t tw = 0, th = 0;
    TIFFGetField(tif, TIFFTAG_TILEWIDTH, &tw);
    TIFFGetField(tif, TIFFTAG_TILELENGTH, &th);
    const tmsize_t tsize = TIFFTileSize(tif);
    if (!tw || !th || tsize <= 0) {
      TIFFClose(tif);
      return -4;
    }
    const size_t sample_bytes = bits / 8;
    std::vector<uint8_t> tile(tsize);
    for (uint32_t y0 = 0; y0 < h; y0 += th) {
      for (uint32_t x0 = 0; x0 < w; x0 += tw) {
        if (TIFFReadTile(tif, tile.data(), x0, y0, 0, 0) < 0) {
          TIFFClose(tif);
          return -4;
        }
        const uint32_t ny = th < h - y0 ? th : h - y0;
        const uint32_t nx = tw < w - x0 ? tw : w - x0;
        for (uint32_t ty = 0; ty < ny; ++ty) {
          convert_run(tile.data() + (size_t)ty * tw * sample_bytes,
                      out + (size_t)(y0 + ty) * width + x0, nx, bits, fmt);
        }
      }
    }
    TIFFClose(tif);
    return 0;
  }

  const tmsize_t scanline = TIFFScanlineSize(tif);
  std::vector<uint8_t> row(scanline);
  for (uint32_t y = 0; y < h; ++y) {
    if (TIFFReadScanline(tif, row.data(), y) < 0) {
      TIFFClose(tif);
      return -3;
    }
    convert_run(row.data(), out + (size_t)y * width, w, bits, fmt);
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
      int rc;
      try {
        rc = decode_one(paths[i], dst, height, width);
      } catch (...) {  // e.g. bad_alloc in the row/tile buffer
        rc = -9;       // escaping the thread would std::terminate
      }
      if (rc != 0) {
        std::memset(dst, 0, frame_px * sizeof(int16_t));
        status[i] = 1;
        failures.fetch_add(1);
      } else {
        status[i] = 0;
      }
    }
  };

  // The calling thread works the queue too: if spawning extra threads
  // fails (std::system_error under RLIMIT_NPROC pressure), the batch
  // still completes single-threaded instead of an exception crossing
  // the extern "C"/ctypes boundary (undefined behavior).
  std::vector<std::thread> pool;
  const int nt = nthreads > n ? n : nthreads;
  try {
    pool.reserve(nt - 1);
    for (int t = 0; t < nt - 1; ++t) pool.emplace_back(worker);
  } catch (...) {
  }
  worker();
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
