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

// ---------------------------------------------------------------------------
// zlib-wrapped DEFLATE decode (RFC 1950/1951), written from the RFCs.
//
// Two-level Huffman tables (zlib/libdeflate-style): a 2^root-entry root
// table that stays L1-resident (root <= 10 -> <= 4 KB) resolves every
// code of length <= root in one load; rarer longer codes indirect
// through per-prefix subtables.  A 15-bit single-level table (128 KB)
// was measured decode-bound on L2 latency — the frequent short codes
// replicate across the whole table, so lookups touch random lines.
// 64-bit bit reservoir refilled 8 bytes at a time.
// ---------------------------------------------------------------------------

namespace {

struct BitReader {
  const uint8_t* src;
  long long len;
  long long pos = 0;
  uint64_t bits = 0;
  int nbits = 0;

  inline void refill() {
    if (nbits < 0) return;  // corrupt-stream overconsumption: a negative
    // shift below would be UB; leaving the reservoir empty makes every
    // caller's availability check fail and the decode return -1
    if (pos + 8 <= len) {
      // branchless 8-byte refill: the shift keeps exactly the bytes
      // that fit above the current reservoir; afterwards 56<=nbits<=63
      uint64_t w;
      __builtin_memcpy(&w, src + pos, 8);
      bits |= w << nbits;
      pos += (63 - nbits) >> 3;
      nbits |= 56;
    } else {
      while (nbits <= 56 && pos < len) {
        bits |= (uint64_t)src[pos++] << nbits;
        nbits += 8;
      }
    }
  }
  inline bool take(int n, uint32_t* out) {  // n <= 32
    if (nbits < n) refill();
    if (nbits < n) return false;
    *out = (uint32_t)(bits & ((1u << n) - 1));
    bits >>= n;
    nbits -= n;
    return true;
  }
  inline void align_byte() {
    int drop = nbits & 7;
    bits >>= drop;
    nbits -= drop;
  }
};

// Entry layout (uint32): (symbol << 8) | code_len, code_len in 1..15.
// A root entry for a long-code prefix instead holds
// (subtable_offset << 8) | 0x80 | sub_bits.  0 = invalid.
struct Huff {
  std::vector<uint32_t> table;  // root table followed by subtables
  int root = 0;                 // root index width

  // lens[i] = code length of symbol i (0 = unused). root_pref caps the
  // root width (10 for litlen -> 4 KB, 8 for dist -> 1 KB). Returns
  // false on an over-subscribed or (multi-code) incomplete set.
  bool build(const uint8_t* lens, int n, int root_pref) {
    int count[16] = {0};
    for (int i = 0; i < n; ++i) count[lens[i]]++;
    int max_len = 0, codes = 0;
    for (int l = 1; l <= 15; ++l)
      if (count[l]) { max_len = l; codes += count[l]; }
    if (codes == 0) {  // empty table (legal for unused dist alphabet)
      root = 1;
      table.assign(2, 0);
      return true;
    }
    long long kraft = 0;
    for (int l = 1; l <= 15; ++l) kraft += (long long)count[l] << (15 - l);
    if (kraft > (1ll << 15)) return false;            // over-subscribed
    if (kraft < (1ll << 15) && codes > 1) return false;  // incomplete
    root = max_len < root_pref ? max_len : root_pref;
    uint32_t root_size = 1u << root;

    // canonical first-code per length
    uint32_t next[16] = {0};
    uint32_t code = 0;
    for (int l = 1; l <= 15; ++l) {
      code = (code + count[l - 1]) << 1;
      next[l] = code;
    }
    uint32_t first[16];
    std::memcpy(first, next, sizeof(first));

    // pass 1: widest long code per root slot -> subtable sizes
    uint8_t sub_bits[1u << 10] = {0};
    size_t total = root_size;
    if (max_len > root) {
      for (int sym = 0; sym < n; ++sym) {
        int l = lens[sym];
        if (l <= root) continue;
        uint32_t c = first[l]++;
        uint32_t rev = 0;
        for (int k = 0; k < l; ++k) rev |= ((c >> k) & 1u) << (l - 1 - k);
        uint32_t slot = rev & (root_size - 1);
        if (l - root > sub_bits[slot]) sub_bits[slot] = (uint8_t)(l - root);
      }
      for (uint32_t s = 0; s < root_size; ++s)
        if (sub_bits[s]) total += (size_t)1 << sub_bits[s];
    }
    table.assign(total, 0);

    // root pointers to subtables
    size_t off = root_size;
    uint32_t sub_off[1u << 10];
    for (uint32_t s = 0; s < root_size; ++s) {
      if (max_len > root && sub_bits[s]) {
        sub_off[s] = (uint32_t)off;
        table[s] = ((uint32_t)off << 8) | 0x80u | sub_bits[s];
        off += (size_t)1 << sub_bits[s];
      }
    }

    // pass 2: fill entries (bit-reversed: DEFLATE serializes codes
    // MSB-first into an LSB-first bit stream)
    for (int sym = 0; sym < n; ++sym) {
      int l = lens[sym];
      if (!l) continue;
      uint32_t c = next[l]++;
      uint32_t rev = 0;
      for (int k = 0; k < l; ++k) rev |= ((c >> k) & 1u) << (l - 1 - k);
      uint32_t entry = ((uint32_t)sym << 8) | (uint32_t)l;
      if (l <= root) {
        for (uint32_t idx = rev; idx < root_size; idx += 1u << l)
          table[idx] = entry;
      } else {
        uint32_t slot = rev & (root_size - 1);
        uint32_t high = rev >> root;  // remaining l-root code bits
        uint32_t sb = sub_bits[slot];
        for (uint32_t idx = high; idx < (1u << sb); idx += 1u << (l - root))
          table[sub_off[slot] + idx] = entry;
      }
    }
    return true;
  }

  // decode one symbol; -1 on invalid/truncated
  inline int decode(BitReader& br) const {
    if (br.nbits < 15) br.refill();
    uint32_t e = table[br.bits & ((1u << root) - 1)];
    uint32_t l = e & 0xffu;
    if (l & 0x80u) {  // long code: indirect through the subtable
      e = table[(e >> 8) + ((br.bits >> root) & ((1u << (l & 0x7fu)) - 1))];
      l = e & 0xffu;
    }
    if (l == 0 || (int)l > br.nbits) return -1;
    br.bits >>= l;
    br.nbits -= (int)l;
    return (int)(e >> 8);
  }

  // fastloop variant: caller guarantees the reservoir holds enough bits
  // (budgeted per iteration), so no refill and no truncation check —
  // only the invalid-code check survives.  -1 on invalid.
  inline int decode_fast(BitReader& br) const {
    uint32_t e = table[br.bits & ((1u << root) - 1)];
    uint32_t l = e & 0xffu;
    if (l & 0x80u) {
      e = table[(e >> 8) + ((br.bits >> root) & ((1u << (l & 0x7fu)) - 1))];
      l = e & 0xffu;
    }
    if (l == 0) return -1;
    br.bits >>= l;
    br.nbits -= (int)l;
    return (int)(e >> 8);
  }
};

const uint16_t kLenBase[29] = {3,  4,  5,  6,  7,  8,  9,  10, 11,  13,
                               15, 17, 19, 23, 27, 31, 35, 43, 51,  59,
                               67, 83, 99, 115, 131, 163, 195, 227, 258};
const uint8_t kLenExtra[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
                               2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0};
const uint16_t kDistBase[30] = {1,    2,    3,    4,    5,    7,     9,
                                13,   17,   25,   33,   49,   65,    97,
                                129,  193,  257,  385,  513,  769,   1025,
                                1537, 2049, 3073, 4097, 6145, 8193,  12289,
                                16385, 24577};
const uint8_t kDistExtra[30] = {0, 0, 0,  0,  1,  1,  2,  2,  3,  3,
                                4, 4, 5,  5,  6,  6,  7,  7,  8,  8,
                                9, 9, 10, 10, 11, 11, 12, 12, 13, 13};
const uint8_t kCLPerm[19] = {16, 17, 18, 0, 8,  7, 9,  6, 10, 5,
                             11, 4,  12, 3, 13, 2, 14, 1, 15};

uint32_t adler32(const uint8_t* p, long long n) {
  uint32_t a = 1, b = 0;
  while (n > 0) {
    long long chunk = n > 5552 ? 5552 : n;  // max before 32-bit overflow
    for (long long i = 0; i < chunk; ++i) {
      a += p[i];
      b += a;
    }
    a %= 65521;
    b %= 65521;
    p += chunk;
    n -= chunk;
  }
  return (b << 16) | a;
}

}  // namespace

extern "C" long long unmicst_inflate(const uint8_t* src, long long src_len,
                                     uint8_t* dst, long long dst_cap) {
  // zlib header: CM=8, FDICT unset, header checksum valid
  if (src_len < 6) return -1;
  uint8_t cmf = src[0], flg = src[1];
  if ((cmf & 0x0f) != 8 || (flg & 0x20) || ((cmf * 256u + flg) % 31) != 0)
    return -1;

  BitReader br{src + 2, src_len - 2 - 4};  // trailer: 4-byte adler32
  long long out = 0;
  Huff litlen, dist;
  std::vector<uint8_t> lens(288 + 32);

  for (;;) {
    uint32_t bfinal, btype;
    if (!br.take(1, &bfinal) || !br.take(2, &btype)) return -1;

    if (btype == 0) {  // stored
      br.align_byte();
      // drain whole bytes held in the reservoir back to a byte position
      long long p = br.pos - br.nbits / 8;
      if (p + 4 > br.len) return -1;
      uint32_t n = src[2 + p] | ((uint32_t)src[2 + p + 1] << 8);
      uint32_t nn = src[2 + p + 2] | ((uint32_t)src[2 + p + 3] << 8);
      if ((n ^ nn) != 0xffff) return -1;
      p += 4;
      if (p + n > br.len || out + n > dst_cap) return -1;
      std::memcpy(dst + out, src + 2 + p, n);
      out += n;
      br.pos = p + n;
      br.bits = 0;
      br.nbits = 0;
    } else if (btype == 1 || btype == 2) {
      if (btype == 1) {  // fixed tables
        for (int i = 0; i < 288; ++i)
          lens[i] = i < 144 ? 8 : i < 256 ? 9 : i < 280 ? 7 : 8;
        if (!litlen.build(lens.data(), 288, 10)) return -1;
        // RFC 1951 3.2.6: the fixed distance code is built over 32
        // symbols (30-31 never appear in data but complete the code)
        for (int i = 0; i < 32; ++i) lens[i] = 5;
        if (!dist.build(lens.data(), 32, 8)) return -1;
      } else {  // dynamic tables
        uint32_t hlit, hdist, hclen;
        if (!br.take(5, &hlit) || !br.take(5, &hdist) || !br.take(4, &hclen))
          return -1;
        int nlit = (int)hlit + 257, ndist = (int)hdist + 1,
            ncl = (int)hclen + 4;
        if (nlit > 286 || ndist > 30) return -1;
        uint8_t cl_lens[19] = {0};
        for (int i = 0; i < ncl; ++i) {
          uint32_t v;
          if (!br.take(3, &v)) return -1;
          cl_lens[kCLPerm[i]] = (uint8_t)v;
        }
        Huff cl;
        if (!cl.build(cl_lens, 19, 7)) return -1;
        int total = nlit + ndist, i = 0;
        while (i < total) {
          int sym = cl.decode(br);
          if (sym < 0) return -1;
          if (sym < 16) {
            lens[i++] = (uint8_t)sym;
          } else if (sym == 16) {
            uint32_t rep;
            if (i == 0 || !br.take(2, &rep)) return -1;
            uint8_t prev = lens[i - 1];
            for (uint32_t k = 0; k < rep + 3; ++k) {
              if (i >= total) return -1;
              lens[i++] = prev;
            }
          } else {
            uint32_t rep;
            int base = sym == 17 ? 3 : 11;
            if (!br.take(sym == 17 ? 3 : 7, &rep)) return -1;
            for (uint32_t k = 0; k < rep + base; ++k) {
              if (i >= total) return -1;
              lens[i++] = 0;
            }
          }
        }
        if (lens[256] == 0) return -1;  // end-of-block must be codable
        if (!litlen.build(lens.data(), nlit, 10)) return -1;
        if (!dist.build(lens.data() + nlit, ndist, 8)) return -1;
      }

      // --- fastloop: while one max-length match (258) plus 8-byte
      // overcopy fits in dst and a bulk refill is available, run with
      // all bounds checks hoisted.  Bit budget: top refill (>=56) covers
      // two litlen codes (2x15 = 30); the match path refills again
      // before its extras (5+15+13 = 33 <= 56).
      bool eob = false;
      while (out + 266 <= dst_cap && br.pos + 8 <= br.len) {
        br.refill();
        int sym = litlen.decode_fast(br);
        if ((unsigned)sym < 256u) {
          dst[out++] = (uint8_t)sym;
          sym = litlen.decode_fast(br);
          if ((unsigned)sym < 256u) {
            dst[out++] = (uint8_t)sym;
            continue;
          }
        }
        if (sym == 256) { eob = true; break; }
        if (sym < 0 || sym > 285) return -1;
        br.refill();  // restore the bit budget for extras + distance
        int eb = kLenExtra[sym - 257];
        uint32_t extra = (uint32_t)(br.bits & ((1u << eb) - 1));
        br.bits >>= eb;
        br.nbits -= eb;
        long long length = kLenBase[sym - 257] + extra;
        int dsym = dist.decode_fast(br);
        if (dsym < 0 || dsym > 29) return -1;
        eb = kDistExtra[dsym];
        extra = (uint32_t)(br.bits & ((1u << eb) - 1));
        br.bits >>= eb;
        br.nbits -= eb;
        long long d = kDistBase[dsym] + extra;
        if (d > out) return -1;
        uint8_t* p = dst + out;
        const uint8_t* q = p - d;
        if (d >= length) {
          std::memcpy(p, q, (size_t)length);  // e.g. previous-row copy
        } else if (d == 1) {
          std::memset(p, q[0], (size_t)length);  // RLE-style run
        } else if (d >= 8) {
          long long k = 0;  // overcopy of <= 7 bytes is inside the slack
          while (k < length) {
            __builtin_memcpy(p + k, q + k, 8);
            k += 8;
          }
        } else {
          for (long long k = 0; k < length; ++k) p[k] = q[k];
        }
        out += length;
      }

      if (!eob) {
        for (;;) {  // safe tail loop: per-symbol checks + self-refill
          int sym = litlen.decode(br);
          if (sym < 0) return -1;
          if (sym < 256) {
            if (out >= dst_cap) return -1;
            dst[out++] = (uint8_t)sym;
            continue;
          }
          if (sym == 256) break;  // end of block
          if (sym > 285) return -1;
          uint32_t extra = 0;
          int eb = kLenExtra[sym - 257];
          if (eb && !br.take(eb, &extra)) return -1;
          long long length = kLenBase[sym - 257] + extra;
          int dsym = dist.decode(br);
          if (dsym < 0 || dsym > 29) return -1;
          eb = kDistExtra[dsym];
          extra = 0;
          if (eb && !br.take(eb, &extra)) return -1;
          long long d = kDistBase[dsym] + extra;
          if (d > out || out + length > dst_cap) return -1;
          uint8_t* p = dst + out;
          const uint8_t* q = p - d;
          for (long long k = 0; k < length; ++k) p[k] = q[k];
          out += length;
        }
      }
    } else {
      return -1;  // btype 3 reserved
    }
    if (bfinal) break;
  }

  // adler32 trailer (big-endian), located after the consumed bytes
  br.align_byte();
  long long tail = 2 + br.pos - br.nbits / 8;
  if (tail + 4 > src_len) return -1;
  uint32_t want = ((uint32_t)src[tail] << 24) | ((uint32_t)src[tail + 1] << 16) |
                  ((uint32_t)src[tail + 2] << 8) | src[tail + 3];
  if (adler32(dst, out) != want) return -1;
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
