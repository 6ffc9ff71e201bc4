// Clean-room raw Snappy block codec (format: google/snappy format_description.txt)
// for the .flippy mip container (utils/flippy.py; the reference compresses mip
// payloads with supersnappy — /root/reference/src/figdraw/common/formatflippy.nim:77-149).
//
// Build: g++ -O2 -shared -fPIC -std=c++17 -o libfigdraw_snappy.so snappy.cpp
//
// Raw block format (no framing):
//   preamble: uvarint uncompressed length
//   elements: tag byte, low 2 bits select
//     00 literal   — len-1 in tag>>2 if <=59, else (tag>>2)-59 extra LE bytes
//     01 copy      — len = ((tag>>2)&7)+4, offset = ((tag>>5)<<8) | next byte
//     10 copy      — len = (tag>>2)+1, offset = next 2 LE bytes
//     11 copy      — len = (tag>>2)+1, offset = next 4 LE bytes
//   copies may overlap (offset < len → byte-wise propagation).

#include <cstdint>
#include <cstring>

namespace {

constexpr int kFragment = 65536;     // compress in 64 KiB windows
constexpr int kHashBits = 14;
constexpr int kHashSize = 1 << kHashBits;

inline uint32_t load32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

inline uint32_t hash32(uint32_t v) {
  return (v * 0x1e35a7bdu) >> (32 - kHashBits);
}

inline uint8_t* emit_literal(uint8_t* dst, const uint8_t* src, int len) {
  int n = len - 1;
  if (n < 60) {
    *dst++ = (uint8_t)(n << 2);
  } else {
    int count = 0;
    uint8_t tmp[4];
    int m = n;
    while (m > 0 || count == 0) {
      tmp[count++] = (uint8_t)(m & 0xff);
      m >>= 8;
    }
    *dst++ = (uint8_t)((59 + count) << 2);
    for (int i = 0; i < count; i++) *dst++ = tmp[i];
  }
  std::memcpy(dst, src, len);
  return dst + len;
}

inline uint8_t* emit_copy_upto64(uint8_t* dst, int offset, int len) {
  if (len >= 4 && len <= 11 && offset < 2048) {
    *dst++ = (uint8_t)(1 | ((len - 4) << 2) | ((offset >> 8) << 5));
    *dst++ = (uint8_t)(offset & 0xff);
  } else {
    *dst++ = (uint8_t)(2 | ((len - 1) << 2));
    *dst++ = (uint8_t)(offset & 0xff);
    *dst++ = (uint8_t)((offset >> 8) & 0xff);
  }
  return dst;
}

inline uint8_t* emit_copy(uint8_t* dst, int offset, int len) {
  while (len >= 68) {
    dst = emit_copy_upto64(dst, offset, 64);
    len -= 64;
  }
  if (len > 64) {
    dst = emit_copy_upto64(dst, offset, 60);
    len -= 60;
  }
  return emit_copy_upto64(dst, offset, len);
}

}  // namespace

extern "C" {

// worst case: preamble (5) + per-fragment literal overhead
int fd_snappy_max_compressed_length(int n) {
  return 32 + n + n / 6;
}

// returns compressed size written to dst (caller sizes dst with the above)
int fd_snappy_compress(const uint8_t* src, int n, uint8_t* dst) {
  uint8_t* d = dst;
  // uvarint preamble
  uint32_t v = (uint32_t)n;
  while (v >= 0x80) {
    *d++ = (uint8_t)(v | 0x80);
    v >>= 7;
  }
  *d++ = (uint8_t)v;

  static thread_local uint16_t table[kHashSize];
  int pos = 0;
  while (pos < n) {
    int frag_len = n - pos < kFragment ? n - pos : kFragment;
    const uint8_t* base = src + pos;
    std::memset(table, 0, sizeof(table));
    int i = 0;
    int lit_start = 0;
    if (frag_len >= 8) {
      int limit = frag_len - 4;
      i = 1;
      while (i < limit) {
        uint32_t cur = load32(base + i);
        uint32_t h = hash32(cur);
        int cand = table[h];
        table[h] = (uint16_t)i;
        if (cand < i && load32(base + cand) == cur) {
          // extend match
          int len = 4;
          while (i + len < frag_len && base[cand + len] == base[i + len]) len++;
          if (i > lit_start) d = emit_literal(d, base + lit_start, i - lit_start);
          d = emit_copy(d, i - cand, len);
          i += len;
          lit_start = i;
        } else {
          i++;
        }
      }
    }
    if (frag_len > lit_start)
      d = emit_literal(d, base + lit_start, frag_len - lit_start);
    pos += frag_len;
  }
  return (int)(d - dst);
}

// parse the preamble; -1 on malformed input
int fd_snappy_uncompressed_length(const uint8_t* src, int n) {
  uint32_t len = 0;
  int shift = 0;
  for (int i = 0; i < n && i < 5; i++) {
    len |= (uint32_t)(src[i] & 0x7f) << shift;
    if (!(src[i] & 0x80)) return (int)len;
    shift += 7;
  }
  return -1;
}

// returns bytes written, or -1 on malformed/overflowing input
int fd_snappy_uncompress(const uint8_t* src, int n, uint8_t* dst, int cap) {
  // skip preamble
  int ip = 0;
  uint32_t expect = 0;
  int shift = 0;
  while (true) {
    if (ip >= n || ip >= 5) return -1;
    uint8_t b = src[ip++];
    expect |= (uint32_t)(b & 0x7f) << shift;
    shift += 7;
    if (!(b & 0x80)) break;
  }
  if ((int)expect > cap) return -1;

  int op = 0;
  while (ip < n) {
    uint8_t tag = src[ip++];
    int kind = tag & 3;
    if (kind == 0) {  // literal
      // assemble the length unsigned/wide: a 4-extra-byte length with the top
      // bit set would overflow a signed int to negative and slip past the
      // bounds checks into a huge memcpy
      int64_t len = (tag >> 2) + 1;
      if (len > 60) {
        int extra = (int)len - 60;
        if (ip + extra > n) return -1;
        uint32_t raw = 0;
        for (int i = 0; i < extra; i++) raw |= (uint32_t)src[ip + i] << (8 * i);
        len = (int64_t)raw + 1;
        ip += extra;
      }
      if (len <= 0 || len > (int64_t)(n - ip) || len > (int64_t)(cap - op))
        return -1;
      std::memcpy(dst + op, src + ip, (size_t)len);
      ip += (int)len;
      op += (int)len;
    } else {
      int len, offset;
      if (kind == 1) {
        if (ip >= n) return -1;
        len = ((tag >> 2) & 7) + 4;
        offset = ((tag >> 5) << 8) | src[ip++];
      } else if (kind == 2) {
        if (ip + 2 > n) return -1;
        len = (tag >> 2) + 1;
        offset = src[ip] | ((int)src[ip + 1] << 8);
        ip += 2;
      } else {
        if (ip + 4 > n) return -1;
        len = (tag >> 2) + 1;
        offset = src[ip] | ((int)src[ip + 1] << 8) | ((int)src[ip + 2] << 16) |
                 ((int)src[ip + 3] << 24);
        ip += 4;
      }
      if (offset <= 0 || offset > op || op + len > cap) return -1;
      if (offset >= len) {
        std::memcpy(dst + op, dst + op - offset, len);
      } else {
        for (int i = 0; i < len; i++) dst[op + i] = dst[op + i - offset];
      }
      op += len;
    }
  }
  if (op != (int)expect) return -1;
  return op;
}

}  // extern "C"
