// Native TFRecord codec (replaces cc/data/tfrecord/, ~800 LoC C++ in the
// reference: record_writer.h:17-27 / record_reader.h:24 — varint-free
// fixed framing, masked crc32c, zlib whole-stream compression).
//
// Framing per record (TFRecord wire format):
//   uint64 length (LE) | uint32 masked_crc32c(length bytes) |
//   payload           | uint32 masked_crc32c(payload)
// A ".zz" chunk is the zlib-compressed concatenation of framed records.
//
// STREAMING on both sides (round-3 fix of the round-1/2 whole-file
// buffers): the reader keeps an open FILE* + incremental z_stream and a
// bounded rolling buffer; the writer deflates record-by-record and
// flushes output as it is produced. Memory stays O(64 KiB + largest
// record) regardless of chunk size — reference-scale golden chunks
// (hundreds of MB) stream through unchanged.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

// Software CRC32C (Castagnoli), byte-wise table.
uint32_t kCrcTable[256];
bool crc_init = []() {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) {
      c = (c & 1) ? (0x82F63B78u ^ (c >> 1)) : (c >> 1);
    }
    kCrcTable[i] = c;
  }
  return true;
}();

uint32_t Crc32c(const uint8_t* data, size_t n) {
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i) {
    c = kCrcTable[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  }
  return c ^ 0xFFFFFFFFu;
}

constexpr uint32_t kMaskDelta = 0xa282ead8u;
uint32_t MaskCrc(uint32_t crc) {
  return ((crc >> 15) | (crc << 17)) + kMaskDelta;
}
uint32_t UnmaskCrc(uint32_t masked) {
  uint32_t rot = masked - kMaskDelta;
  return (rot << 15) | (rot >> 17);
}

void AppendFramed(std::string* out, const uint8_t* rec, size_t len) {
  uint64_t len64 = len;
  char lenbuf[8];
  std::memcpy(lenbuf, &len64, 8);
  uint32_t len_crc =
      MaskCrc(Crc32c(reinterpret_cast<const uint8_t*>(lenbuf), 8));
  uint32_t data_crc = MaskCrc(Crc32c(rec, len));
  out->append(lenbuf, 8);
  out->append(reinterpret_cast<const char*>(&len_crc), 4);
  out->append(reinterpret_cast<const char*>(rec), len);
  out->append(reinterpret_cast<const char*>(&data_crc), 4);
}

constexpr size_t kIoChunk = 1 << 16;  // 64 KiB read/deflate granule

// Full 2-byte zlib header check: CMF must be 0x78, (CMF<<8|FLG) % 31 == 0
// per the zlib spec, and FLG one of the standard level bytes. A bare
// first-byte check misdetects ~1/256 uncompressed files (any whose first
// record length ends in 0x78).
bool LooksZlib(const uint8_t* b, size_t n) {
  if (n < 2) return false;
  if (b[0] != 0x78) return false;
  if (((static_cast<uint32_t>(b[0]) << 8) | b[1]) % 31 != 0) return false;
  return b[1] == 0x01 || b[1] == 0x5E || b[1] == 0x9C || b[1] == 0xDA;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------
// Writer: streams framed records through an incremental deflate.
// ---------------------------------------------------------------------

// Write n records to `path`. zlib_level < 0 => raw; else compressed chunk.
// Returns 0 on success. Memory: O(64 KiB + largest record).
int tfrec_write(const char* path, const uint8_t* const* recs,
                const uint64_t* lens, uint64_t n, int zlib_level) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return 2;
  int err = 0;
  if (zlib_level < 0) {
    std::string framed;
    for (uint64_t i = 0; i < n && err == 0; ++i) {
      framed.clear();
      AppendFramed(&framed, recs[i], lens[i]);
      if (std::fwrite(framed.data(), 1, framed.size(), f) != framed.size())
        err = 3;
    }
  } else {
    z_stream zs{};
    if (deflateInit(&zs, zlib_level) != Z_OK) {
      std::fclose(f);
      return 1;
    }
    std::string framed;
    unsigned char outbuf[kIoChunk];
    for (uint64_t i = 0; i <= n && err == 0; ++i) {
      const bool last = i == n;
      if (!last) {
        framed.clear();
        AppendFramed(&framed, recs[i], lens[i]);
        zs.next_in = reinterpret_cast<Bytef*>(&framed[0]);
        zs.avail_in = framed.size();
      } else {
        zs.next_in = nullptr;
        zs.avail_in = 0;
      }
      int rc;
      do {
        zs.next_out = outbuf;
        zs.avail_out = sizeof(outbuf);
        rc = deflate(&zs, last ? Z_FINISH : Z_NO_FLUSH);
        if (rc == Z_STREAM_ERROR) {
          err = 1;
          break;
        }
        size_t have = sizeof(outbuf) - zs.avail_out;
        if (have && std::fwrite(outbuf, 1, have, f) != have) {
          err = 3;
          break;
        }
      } while (zs.avail_out == 0 || (last && rc != Z_STREAM_END));
    }
    deflateEnd(&zs);
  }
  if (std::fclose(f) != 0 && err == 0) err = 3;
  return err;
}

// ---------------------------------------------------------------------
// Reader: open FILE* + incremental inflate + bounded rolling buffer.
// ---------------------------------------------------------------------

struct TfrecReader {
  FILE* f = nullptr;
  bool zlib = false;
  bool in_eof = false;      // no more file bytes
  bool stream_end = false;  // inflate reported Z_STREAM_END
  z_stream zs{};
  std::vector<unsigned char> inbuf;  // compressed (or raw) file bytes
  size_t in_pos = 0, in_len = 0;
  std::string data;  // decompressed-but-unconsumed framed bytes
  size_t pos = 0;    // consumed prefix of `data`

  ~TfrecReader() {
    if (zlib) inflateEnd(&zs);
    if (f) std::fclose(f);
  }

  void Compact() {
    // Drop the consumed prefix once it dominates the buffer.
    if (pos > (1 << 20) && pos > data.size() / 2) {
      data.erase(0, pos);
      pos = 0;
    }
  }

  // Ensure >= `need` unconsumed bytes in `data` (or EOF). False = I/O or
  // inflate error.
  bool Fill(size_t need) {
    while (data.size() - pos < need) {
      if (in_pos == in_len && !in_eof) {
        in_len = std::fread(inbuf.data(), 1, inbuf.size(), f);
        in_pos = 0;
        if (in_len < inbuf.size()) {
          if (std::ferror(f)) return false;
          in_eof = true;
        }
      }
      if (!zlib) {
        if (in_pos == in_len) return true;  // raw EOF
        data.append(reinterpret_cast<char*>(inbuf.data()) + in_pos,
                    in_len - in_pos);
        in_pos = in_len;
        continue;
      }
      if (stream_end || (in_pos == in_len && in_eof)) return true;
      zs.next_in = inbuf.data() + in_pos;
      zs.avail_in = in_len - in_pos;
      unsigned char out[kIoChunk];
      zs.next_out = out;
      zs.avail_out = sizeof(out);
      int rc = inflate(&zs, Z_NO_FLUSH);
      if (rc != Z_OK && rc != Z_STREAM_END && rc != Z_BUF_ERROR) {
        // Header looked like zlib but the stream isn't: a raw-framed file
        // whose first record length bytes happen to form a valid zlib
        // header (e.g. len 0x9C78) lands here on the FIRST inflate, before
        // any output. Rewind and reparse as raw framing (pre-streaming
        // behavior). A genuine mid-stream corruption (output already
        // produced) still reports an error.
        if (zs.total_out == 0 && data.empty()) {
          inflateEnd(&zs);
          zlib = false;
          if (std::fseek(f, 0, SEEK_SET) != 0) return false;
          in_pos = in_len = 0;
          in_eof = false;
          continue;
        }
        return false;
      }
      in_pos = in_len - zs.avail_in;
      data.append(reinterpret_cast<char*>(out), sizeof(out) - zs.avail_out);
      if (rc == Z_STREAM_END) stream_end = true;
      if (rc == Z_BUF_ERROR && in_pos == in_len && in_eof) return true;
    }
    return true;
  }
};

// Open a file (auto-detects zlib by its 2-byte header). Returns handle or 0.
void* tfrec_open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  unsigned char hdr[2];
  size_t got = std::fread(hdr, 1, 2, f);
  std::fseek(f, 0, SEEK_SET);
  auto* r = new TfrecReader();
  r->f = f;
  r->inbuf.resize(kIoChunk);
  r->zlib = got == 2 && LooksZlib(hdr, 2);
  if (r->zlib && inflateInit(&r->zs) != Z_OK) {
    r->zlib = false;  // fall back to raw
  }
  return r;
}

// Read next record into buf (cap bytes). Returns record length (>= 0),
// -3 at EOF, -1 on corruption, -2 if cap too small (retry with bigger buf;
// the reader does not advance).
int64_t tfrec_next(void* handle, uint8_t* buf, uint64_t cap) {
  auto* r = static_cast<TfrecReader*>(handle);
  if (!r->Fill(12)) return -1;
  size_t avail = r->data.size() - r->pos;
  if (avail == 0) return -3;
  if (avail < 12) return -1;
  const char* base = r->data.data() + r->pos;
  uint64_t len;
  std::memcpy(&len, base, 8);
  uint32_t len_crc;
  std::memcpy(&len_crc, base + 8, 4);
  if (UnmaskCrc(len_crc) !=
      Crc32c(reinterpret_cast<const uint8_t*>(base), 8)) {
    return -1;
  }
  if (!r->Fill(12 + len + 4)) return -1;
  if (r->data.size() - r->pos < 12 + len + 4) return -1;
  if (len > cap) return -2;
  base = r->data.data() + r->pos;  // Fill may have reallocated
  const uint8_t* payload = reinterpret_cast<const uint8_t*>(base + 12);
  uint32_t data_crc;
  std::memcpy(&data_crc, base + 12 + len, 4);
  if (UnmaskCrc(data_crc) != Crc32c(payload, len)) return -1;
  std::memcpy(buf, payload, len);
  r->pos += 12 + len + 4;
  r->Compact();
  return static_cast<int64_t>(len);
}

void tfrec_close(void* handle) { delete static_cast<TfrecReader*>(handle); }

}  // extern "C"
