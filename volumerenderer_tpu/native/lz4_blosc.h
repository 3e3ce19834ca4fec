// Minimal LZ4-block + Blosc1-frame decoders for VDB ingestion.
//
// OpenVDB files compress leaf buffers with zlib or Blosc(+LZ4shuffle);
// this header provides the decompression half from scratch (the image has
// no blosc library).  Original implementation written from the public
// format descriptions:
//   LZ4 block: sequences of [token][literals][offset][match] with 4-bit
//   literal/match length nibbles and 0xFF extension bytes; matches may
//   overlap the output (copy byte-wise).
//   Blosc1 frame: 16-byte header {version, versionlz, flags, typesize,
//   nbytes(i32), blocksize(i32), cbytes(i32)} followed by a block index of
//   int32 offsets (one per block) and per-block [i32 compressed-size]
//   chunks; flags bit1 = shuffle, bits 5-7 = codec id (1 == blosclz,
//   2 == lz4/lz4hc).
//
// Reference parity: the upstream renderer links the real OpenVDB/Blosc
// stack (src/main.cpp:1157-1215); this is the TPU build's dependency-free
// equivalent for the host ingestion path.

#pragma once

#include <cstdint>
#include <cstring>
#include <vector>

namespace vdbio {

// Decompress one raw LZ4 block. Returns bytes written, or -1 on error.
inline int64_t lz4_decompress_block(const uint8_t* src, int64_t src_len,
                                    uint8_t* dst, int64_t dst_cap) {
  const uint8_t* sp = src;
  const uint8_t* send = src + src_len;
  uint8_t* dp = dst;
  uint8_t* dend = dst + dst_cap;
  while (sp < send) {
    uint8_t token = *sp++;
    // Literals
    int64_t lit = token >> 4;
    if (lit == 15) {
      uint8_t b;
      do {
        if (sp >= send) return -1;
        b = *sp++;
        lit += b;
      } while (b == 255);
    }
    if (sp + lit > send || dp + lit > dend) return -1;
    std::memcpy(dp, sp, lit);
    sp += lit;
    dp += lit;
    if (sp >= send) break;  // last sequence has no match
    // Match
    if (sp + 2 > send) return -1;
    uint16_t offset = (uint16_t)(sp[0] | (sp[1] << 8));
    sp += 2;
    if (offset == 0) return -1;
    int64_t mlen = (token & 0xF);
    if (mlen == 15) {
      uint8_t b;
      do {
        if (sp >= send) return -1;
        b = *sp++;
        mlen += b;
      } while (b == 255);
    }
    mlen += 4;
    const uint8_t* mp = dp - offset;
    if (mp < dst || dp + mlen > dend) return -1;
    for (int64_t i = 0; i < mlen; ++i) dp[i] = mp[i];  // overlap-safe
    dp += mlen;
  }
  return dp - dst;
}

// Undo blosc byte-shuffle: input laid out as typesize planes.
inline void blosc_unshuffle(const uint8_t* src, uint8_t* dst, int64_t nbytes,
                            int typesize) {
  if (typesize <= 1) {
    std::memcpy(dst, src, nbytes);
    return;
  }
  int64_t n = nbytes / typesize;
  int64_t tail = nbytes - n * typesize;
  for (int t = 0; t < typesize; ++t)
    for (int64_t i = 0; i < n; ++i) dst[i * typesize + t] = src[t * n + i];
  if (tail) std::memcpy(dst + n * typesize, src + n * typesize, tail);
}

inline int32_t rd_i32(const uint8_t* p) {
  int32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

// Decompress a Blosc1 frame. Returns bytes written or -1.
inline int64_t blosc_decompress(const uint8_t* src, int64_t src_len,
                                uint8_t* dst, int64_t dst_cap) {
  if (src_len < 16) return -1;
  uint8_t flags = src[2];
  int typesize = src[3];
  int32_t nbytes = rd_i32(src + 4);
  int32_t blocksize = rd_i32(src + 8);
  int32_t cbytes = rd_i32(src + 12);
  if (nbytes < 0 || nbytes > dst_cap || cbytes > src_len) return -1;
  bool shuffled = (flags & 0x2) != 0;
  bool memcpyed = (flags & 0x4) != 0;
  int codec = (flags >> 5) & 0x7;

  std::vector<uint8_t> tmp;
  uint8_t* out = dst;
  if (shuffled) {
    tmp.resize(nbytes);
    out = tmp.data();
  }

  if (memcpyed) {
    if (16 + nbytes > src_len) return -1;
    std::memcpy(out, src + 16, nbytes);
  } else {
    if (blocksize <= 0) return -1;
    int nblocks = (nbytes + blocksize - 1) / blocksize;
    const uint8_t* idx = src + 16;
    if (16 + 4 * nblocks > src_len) return -1;
    for (int b = 0; b < nblocks; ++b) {
      int32_t boff = rd_i32(idx + 4 * b);
      if (boff < 0 || boff + 4 > src_len) return -1;
      int32_t csize = rd_i32(src + boff);
      int64_t want = (b == nblocks - 1) ? nbytes - (int64_t)b * blocksize
                                        : blocksize;
      const uint8_t* bsrc = src + boff + 4;
      if (boff + 4 + csize > src_len) return -1;
      // Blosc convention: csize == want means the block is stored raw.
      if (csize == want) {
        std::memcpy(out + (int64_t)b * blocksize, bsrc, want);
      } else if (codec == 2 || codec == 3) {  // lz4 / lz4hc
        // Shuffled blocs compress each typesize plane as its own LZ4
        // stream?  No — blosc compresses the whole (shuffled) block as one
        // LZ4 block per "split" part; splitting occurs for typesize<=
        // MAX_SPLITS when block fits; handle both: try whole-block first.
        int64_t got = lz4_decompress_block(bsrc, csize,
                                           out + (int64_t)b * blocksize, want);
        if (got != want) {
          // Split mode: typesize sub-streams, each with its own 4-byte
          // compressed size prefix.
          const uint8_t* p = bsrc;
          uint8_t* q = out + (int64_t)b * blocksize;
          int64_t per = want / (typesize ? typesize : 1);
          bool ok = typesize > 0 && want % typesize == 0;
          if (ok) {
            // First sub-stream size is the csize we already read? No: in
            // split mode the block payload is a sequence of
            // [i32 size][data] per part, and the first part's size was the
            // value at boff.  Re-walk from boff.
            p = src + boff;
            for (int t = 0; t < typesize && ok; ++t) {
              if (p + 4 > src + src_len) { ok = false; break; }
              int32_t ps = rd_i32(p);
              p += 4;
              if (p + ps > src + src_len) { ok = false; break; }
              if (ps == per) {
                std::memcpy(q, p, per);
              } else {
                int64_t g = lz4_decompress_block(p, ps, q, per);
                if (g != per) { ok = false; break; }
              }
              p += ps;
              q += per;
            }
          }
          if (!ok) return -1;
        }
      } else {
        return -1;  // blosclz etc. unsupported
      }
    }
  }

  if (shuffled) blosc_unshuffle(out, dst, nbytes, typesize);
  return nbytes;
}

}  // namespace vdbio
