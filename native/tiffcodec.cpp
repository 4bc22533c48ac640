// Native TIFF segment codecs for the slide-IO path.
//
// The reference delegates TIFF decode to libtiff via tifffile/skimage; this
// framework's pure-Python reader (unmicst_tpu/io/tiff.py) handles the
// formats but Python-level LZW decode is slow for multi-GB slides.  This
// tiny C++ library provides the hot decode loops (TIFF-flavor LZW with
// early-change, PackBits, horizontal-predictor undo) behind a C ABI
// consumed via ctypes — no pybind11 dependency.
//
// Build: python native/build.py   (or: g++ -O3 -shared -fPIC -o
//        libunmicst_tiffcodec.so tiffcodec.cpp)

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Returns number of bytes written to dst, or -1 on corrupt stream /
// insufficient dst capacity.
long long unmicst_lzw_decode(const uint8_t* src, long long src_len,
                             uint8_t* dst, long long dst_cap) {
  // TIFF LZW: 9..12-bit MSB-first codes, clear=256, EOI=257, early change.
  struct Entry {
    int32_t prev;   // previous entry index, -1 for root
    uint8_t byte;   // last byte
    uint8_t first;  // first byte of the chain (O(1) KwK / new-entry)
    int32_t len;    // total length
  };
  std::vector<Entry> table(4096);
  auto reset = [&]() {
    for (int i = 0; i < 256; ++i)
      table[i] = {-1, (uint8_t)i, (uint8_t)i, 1};
  };
  reset();
  int next_code = 258;
  int nbits = 9;

  long long out = 0;
  long long bitpos = 0;
  const long long maxbit = src_len * 8;
  int prev_code = -1;

  auto emit = [&](int code) -> long long {
    // write the chain directly into dst, back to front (no temp copy)
    long long n = table[code].len;
    if (out + n > dst_cap) return -1;
    long long i = out + n;
    int c = code;
    while (c >= 0) {
      dst[--i] = table[c].byte;
      c = table[c].prev;
    }
    out += n;
    return n;
  };

  while (bitpos + nbits <= maxbit) {
    long long byte0 = bitpos >> 3;
    uint32_t window;
    if (byte0 + 4 <= src_len) {  // hot path: one unaligned load
      uint32_t raw;
      __builtin_memcpy(&raw, src + byte0, 4);
      window = __builtin_bswap32(raw);
    } else {
      window = 0;
      for (int k = 0; k < 4; ++k) {
        window <<= 8;
        if (byte0 + k < src_len) window |= src[byte0 + k];
      }
    }
    int shift = 32 - (int)(bitpos & 7) - nbits;
    int code = (window >> shift) & ((1 << nbits) - 1);
    bitpos += nbits;

    if (code == 256) {  // clear
      reset();
      next_code = 258;
      nbits = 9;
      prev_code = -1;
      continue;
    }
    if (code == 257) break;  // EOI

    if (prev_code < 0) {
      if (code >= 256) return -1;
      if (emit(code) < 0) return -1;
      prev_code = code;
    } else {
      if (code < next_code) {
        // known code: new entry = prev + first byte of code's chain
        if (next_code < 4096) {
          table[next_code] = {prev_code, table[code].first,
                              table[prev_code].first,
                              table[prev_code].len + 1};
          ++next_code;
        }
        if (emit(code) < 0) return -1;
      } else if (code == next_code) {
        // KwK case: entry = prev + first byte of prev's chain
        if (next_code >= 4096) return -1;
        table[next_code] = {prev_code, table[prev_code].first,
                            table[prev_code].first,
                            table[prev_code].len + 1};
        ++next_code;
        if (emit(code) < 0) return -1;
      } else {
        return -1;  // corrupt
      }
      prev_code = code;
    }
    // early change (TIFF spec 6.0)
    if (next_code >= (1 << nbits) - 1 && nbits < 12) ++nbits;
  }
  return out;
}

long long unmicst_packbits_decode(const uint8_t* src, long long src_len,
                                  uint8_t* dst, long long dst_cap) {
  long long i = 0, out = 0;
  while (i < src_len) {
    uint8_t h = src[i++];
    if (h < 128) {
      long long n = h + 1;
      if (i + n > src_len || out + n > dst_cap) return -1;
      std::memcpy(dst + out, src + i, (size_t)n);
      i += n;
      out += n;
    } else if (h > 128) {
      long long n = 257 - h;
      if (i >= src_len || out + n > dst_cap) return -1;
      std::memset(dst + out, src[i], (size_t)n);
      ++i;
      out += n;
    }  // h == 128: no-op
  }
  return out;
}

// Undo TIFF horizontal differencing predictor in place.
// rows x cols samples of `itemsize` bytes (1 or 2), little-endian.
void unmicst_predictor_undo(uint8_t* data, long long rows, long long cols,
                            int itemsize) {
  if (itemsize == 1) {
    for (long long r = 0; r < rows; ++r) {
      uint8_t* p = data + r * cols;
      for (long long c = 1; c < cols; ++c) p[c] = (uint8_t)(p[c] + p[c - 1]);
    }
  } else if (itemsize == 2) {
    for (long long r = 0; r < rows; ++r) {
      uint16_t* p = (uint16_t*)(data + r * cols * 2);
      for (long long c = 1; c < cols; ++c) p[c] = (uint16_t)(p[c] + p[c - 1]);
    }
  }
}

}  // extern "C"
