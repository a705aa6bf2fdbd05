// Native TFRecord codec (replaces cc/data/tfrecord/, ~800 LoC C++ in the
// reference: record_writer.h:17-27 / record_reader.h:24 — varint-free
// fixed framing, masked crc32c, zlib whole-stream compression).
//
// Framing per record (TFRecord wire format):
//   uint64 length (LE) | uint32 masked_crc32c(length bytes) |
//   payload           | uint32 masked_crc32c(payload)
// A ".zz" chunk is the zlib-compressed concatenation of framed records.
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

bool ZlibDeflate(const std::string& in, std::string* out, int level) {
  uLongf bound = compressBound(in.size());
  out->resize(bound);
  int rc = compress2(reinterpret_cast<Bytef*>(&(*out)[0]), &bound,
                     reinterpret_cast<const Bytef*>(in.data()), in.size(),
                     level);
  if (rc != Z_OK) return false;
  out->resize(bound);
  return true;
}

bool ZlibInflate(const std::string& in, std::string* out) {
  z_stream zs{};
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = reinterpret_cast<Bytef*>(const_cast<char*>(in.data()));
  zs.avail_in = in.size();
  char buf[1 << 16];
  int rc;
  do {
    zs.next_out = reinterpret_cast<Bytef*>(buf);
    zs.avail_out = sizeof(buf);
    rc = inflate(&zs, Z_NO_FLUSH);
    if (rc != Z_OK && rc != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out->append(buf, sizeof(buf) - zs.avail_out);
  } while (rc != Z_STREAM_END && zs.avail_in > 0);
  inflateEnd(&zs);
  return rc == Z_STREAM_END || zs.avail_in == 0;
}

bool ReadFile(const char* path, std::string* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(size);
  size_t got = std::fread(&(*out)[0], 1, size, f);
  std::fclose(f);
  return got == static_cast<size_t>(size);
}

}  // namespace

extern "C" {

// Write n records to `path`. zlib_level < 0 => raw; else compressed chunk.
// Returns 0 on success.
int tfrec_write(const char* path, const uint8_t* const* recs,
                const uint64_t* lens, uint64_t n, int zlib_level) {
  std::string framed;
  for (uint64_t i = 0; i < n; ++i) {
    AppendFramed(&framed, recs[i], lens[i]);
  }
  std::string out;
  const std::string* to_write = &framed;
  if (zlib_level >= 0) {
    if (!ZlibDeflate(framed, &out, zlib_level)) return 1;
    to_write = &out;
  }
  FILE* f = std::fopen(path, "wb");
  if (!f) return 2;
  size_t wrote = std::fwrite(to_write->data(), 1, to_write->size(), f);
  std::fclose(f);
  return wrote == to_write->size() ? 0 : 3;
}

struct TfrecReader {
  std::string data;
  size_t pos = 0;
};

// Full 2-byte zlib header check: CMF must be 0x78, (CMF<<8|FLG) % 31 == 0
// per the zlib spec, and FLG one of the standard level bytes. A bare
// first-byte check misdetects ~1/256 uncompressed files (any whose first
// record length ends in 0x78).
static bool LooksZlib(const std::string& raw) {
  if (raw.size() < 2) return false;
  const uint8_t b0 = static_cast<uint8_t>(raw[0]);
  const uint8_t b1 = static_cast<uint8_t>(raw[1]);
  if (b0 != 0x78) return false;
  if (((static_cast<uint32_t>(b0) << 8) | b1) % 31 != 0) return false;
  return b1 == 0x01 || b1 == 0x5E || b1 == 0x9C || b1 == 0xDA;
}

// Open a file (auto-detects zlib by its 2-byte header). Returns handle or 0.
void* tfrec_open(const char* path) {
  std::string raw;
  if (!ReadFile(path, &raw)) return nullptr;
  auto* r = new TfrecReader();
  if (LooksZlib(raw)) {
    if (!ZlibInflate(raw, &r->data)) {
      // Header looked like zlib but inflate failed: treat as raw framing.
      r->data = std::move(raw);
    }
  } else {
    r->data = std::move(raw);
  }
  return r;
}

// Read next record into buf (cap bytes). Returns record length (>= 0),
// -3 at EOF, -1 on corruption, -2 if cap too small (retry with bigger buf).
int64_t tfrec_next(void* handle, uint8_t* buf, uint64_t cap) {
  auto* r = static_cast<TfrecReader*>(handle);
  if (r->pos >= r->data.size()) return -3;
  if (r->pos + 12 > r->data.size()) return -1;
  uint64_t len;
  std::memcpy(&len, r->data.data() + r->pos, 8);
  uint32_t len_crc;
  std::memcpy(&len_crc, r->data.data() + r->pos + 8, 4);
  if (UnmaskCrc(len_crc) !=
      Crc32c(reinterpret_cast<const uint8_t*>(r->data.data() + r->pos), 8)) {
    return -1;
  }
  if (r->pos + 12 + len + 4 > r->data.size()) return -1;
  if (len > cap) return -2;
  const uint8_t* payload =
      reinterpret_cast<const uint8_t*>(r->data.data() + r->pos + 12);
  uint32_t data_crc;
  std::memcpy(&data_crc, r->data.data() + r->pos + 12 + len, 4);
  if (UnmaskCrc(data_crc) != Crc32c(payload, len)) return -1;
  std::memcpy(buf, payload, len);
  r->pos += 12 + len + 4;
  return static_cast<int64_t>(len);
}

void tfrec_close(void* handle) { delete static_cast<TfrecReader*>(handle); }

}  // extern "C"
