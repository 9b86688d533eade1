// depthio: native depth-image codec for the densereg_tpu data loader.
//
// The reference decodes depth PNGs inside the TF graph
// (/root/reference/data/icvl.py:138, /root/reference/data/nyu.py:148-156).
// In the TPU framework decoding is host-side; this library provides the hot
// path for the offline converters and the streaming loader: a minimal,
// dependency-light (zlib only) PNG decoder for the three encodings the
// datasets use —
//   * 16-bit grayscale (ICVL / MSRA depth),
//   * 8-bit grayscale (widened),
//   * 8-bit RGB with depth packed as (G << 8) | B (NYU),
// plus a std::thread batch API that decodes many frames in parallel without
// holding the Python GIL (ctypes releases it around the call).
//
// Build: make -C native   (produces libdepthio.so; see densereg_tpu/data/
// native.py for the ctypes binding with automatic build + PIL fallback).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

inline int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

struct Header {
  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
};

// error codes
enum {
  OK = 0,
  E_SIGNATURE = -1,
  E_CHUNKS = -2,
  E_UNSUPPORTED = -3,
  E_INFLATE = -4,
  E_FILTER = -5,
  E_SHAPE = -6,
};

int decode_one(const uint8_t* data, size_t size, uint16_t* out, int out_h,
               int out_w, int nyu_packed) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (size < 8 || std::memcmp(data, kSig, 8) != 0) return E_SIGNATURE;

  Header hdr;
  std::vector<uint8_t> idat;
  size_t pos = 8;
  while (pos + 8 <= size) {
    uint32_t len = be32(data + pos);
    if (pos + 12 + len > size) return E_CHUNKS;
    const uint8_t* type = data + pos + 4;
    const uint8_t* body = data + pos + 8;
    if (!std::memcmp(type, "IHDR", 4)) {
      if (len < 13) return E_CHUNKS;
      hdr.width = be32(body);
      hdr.height = be32(body + 4);
      hdr.bit_depth = body[8];
      hdr.color_type = body[9];
      hdr.interlace = body[12];
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), body, body + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + len;
  }
  if (hdr.width == 0 || hdr.height == 0 || idat.empty()) return E_CHUNKS;
  if (hdr.interlace != 0) return E_UNSUPPORTED;  // Adam7 not used by datasets
  if ((int)hdr.height != out_h || (int)hdr.width != out_w) return E_SHAPE;

  int channels;
  switch (hdr.color_type) {
    case 0: channels = 1; break;  // grayscale
    case 2: channels = 3; break;  // RGB
    default: return E_UNSUPPORTED;
  }
  if (hdr.bit_depth != 8 && hdr.bit_depth != 16) return E_UNSUPPORTED;
  if (hdr.bit_depth == 16 && hdr.color_type != 0) return E_UNSUPPORTED;

  const size_t bpp = (size_t)channels * (hdr.bit_depth / 8);  // filter unit
  const size_t rowbytes = bpp * hdr.width;
  const size_t raw_size = (rowbytes + 1) * hdr.height;
  std::vector<uint8_t> raw(raw_size);

  uLongf dst_len = raw_size;
  if (uncompress(raw.data(), &dst_len, idat.data(), idat.size()) != Z_OK ||
      dst_len != raw_size)
    return E_INFLATE;

  // un-filter in place into `img`
  std::vector<uint8_t> img(rowbytes * hdr.height);
  const uint8_t* prev = nullptr;
  for (uint32_t y = 0; y < hdr.height; ++y) {
    const uint8_t* src = raw.data() + y * (rowbytes + 1);
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = img.data() + y * rowbytes;
    switch (filter) {
      case 0:
        std::memcpy(dst, src, rowbytes);
        break;
      case 1:  // Sub
        for (size_t x = 0; x < rowbytes; ++x)
          dst[x] = src[x] + (x >= bpp ? dst[x - bpp] : 0);
        break;
      case 2:  // Up
        for (size_t x = 0; x < rowbytes; ++x)
          dst[x] = src[x] + (prev ? prev[x] : 0);
        break;
      case 3:  // Average
        for (size_t x = 0; x < rowbytes; ++x) {
          int a = x >= bpp ? dst[x - bpp] : 0;
          int b = prev ? prev[x] : 0;
          dst[x] = src[x] + ((a + b) >> 1);
        }
        break;
      case 4:  // Paeth
        for (size_t x = 0; x < rowbytes; ++x) {
          int a = x >= bpp ? dst[x - bpp] : 0;
          int b = prev ? prev[x] : 0;
          int c = (prev && x >= bpp) ? prev[x - bpp] : 0;
          dst[x] = src[x] + paeth(a, b, c);
        }
        break;
      default:
        return E_FILTER;
    }
    prev = dst;
  }

  // convert to uint16 depth
  const size_t n = (size_t)out_h * out_w;
  if (hdr.color_type == 0 && hdr.bit_depth == 16) {
    for (size_t i = 0; i < n; ++i)
      out[i] = (uint16_t(img[2 * i]) << 8) | img[2 * i + 1];  // big-endian
  } else if (hdr.color_type == 0) {  // 8-bit gray
    for (size_t i = 0; i < n; ++i) out[i] = img[i];
  } else {  // 8-bit RGB
    if (nyu_packed) {
      for (size_t i = 0; i < n; ++i)
        out[i] = (uint16_t(img[3 * i + 1]) << 8) | img[3 * i + 2];
    } else {
      for (size_t i = 0; i < n; ++i) out[i] = img[3 * i];  // R channel
    }
  }
  return OK;
}

}  // namespace

extern "C" {

int depthio_decode_png(const uint8_t* data, size_t size, uint16_t* out,
                       int out_h, int out_w, int nyu_packed) {
  return decode_one(data, size, out, out_h, out_w, nyu_packed);
}

// Decode n images concurrently.  datas/sizes index the encoded buffers; out
// is a preallocated (n, out_h, out_w) uint16 array.  Returns 0, or the first
// non-zero per-image error code.
int depthio_decode_png_batch(const uint8_t* const* datas, const size_t* sizes,
                             int n, uint16_t* out, int out_h, int out_w,
                             int nyu_packed, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  if (num_threads > n) num_threads = n;
  std::vector<int> codes(n, OK);
  std::vector<std::thread> threads;
  const size_t frame = (size_t)out_h * out_w;
  for (int t = 0; t < num_threads; ++t) {
    threads.emplace_back([&, t]() {
      for (int i = t; i < n; i += num_threads)
        codes[i] = decode_one(datas[i], sizes[i], out + (size_t)i * frame,
                              out_h, out_w, nyu_packed);
    });
  }
  for (auto& th : threads) th.join();
  for (int i = 0; i < n; ++i)
    if (codes[i] != OK) return codes[i];
  return OK;
}

}  // extern "C"
