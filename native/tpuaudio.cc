// libtpuaudio — native audio ingest for rawaudiovae_kelsey_tpu.
//
// The host-side hot loop of the streaming trainer is wav decode + mono
// mixdown for every file pass (the reference leaned on torchaudio's C++
// backend for this, dataset.py:47-55; this framework's pure-NumPy codec in
// io/wavio.py is the portable fallback).  This library does the byte→float
// conversion and channel mixdown in one pass in C++, exposed via a minimal
// C ABI consumed with ctypes (io/native.py).  Behavior is parity-tested
// against io/wavio.py in tests/test_native.py.
//
// Supported: RIFF/WAVE with PCM u8/s16/s24/s32 and IEEE float32/64, plus
// WAVE_FORMAT_EXTENSIBLE wrappers; chunk walking skips LIST/fact/etc.
//
// Build: make -C native    (produces libtpuaudio.so)

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr uint16_t kPcm = 0x0001;
constexpr uint16_t kFloat = 0x0003;
constexpr uint16_t kExtensible = 0xFFFE;

struct Fmt {
  uint16_t tag = 0;
  uint16_t channels = 0;
  uint32_t rate = 0;
  uint16_t bits = 0;
};

inline uint16_t rd16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}
inline uint32_t rd32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}

// Walk RIFF chunks; fill fmt and locate the data payload.
// Returns 0 on success, negative error code otherwise.
int parse(const uint8_t* data, int64_t len, Fmt* fmt, const uint8_t** payload,
          int64_t* payload_len) {
  if (len < 12 || std::memcmp(data, "RIFF", 4) != 0 ||
      std::memcmp(data + 8, "WAVE", 4) != 0) {
    return -1;  // not a wav
  }
  int64_t riff_end = 8 + static_cast<int64_t>(rd32(data + 4));
  if (riff_end > len) riff_end = len;
  int64_t pos = 12;
  bool have_fmt = false;
  *payload = nullptr;
  while (pos + 8 <= riff_end) {
    const uint8_t* cid = data + pos;
    int64_t csize = static_cast<int64_t>(rd32(data + pos + 4));
    const uint8_t* body = data + pos + 8;
    if (pos + 8 + csize > len) csize = len - pos - 8;
    if (std::memcmp(cid, "fmt ", 4) == 0) {
      if (csize < 16) return -2;
      fmt->tag = rd16(body);
      fmt->channels = rd16(body + 2);
      fmt->rate = rd32(body + 4);
      fmt->bits = rd16(body + 14);
      if (fmt->tag == kExtensible) {
        if (csize < 40) return -2;
        fmt->tag = rd16(body + 24);  // first two bytes of SubFormat GUID
      }
      if (fmt->channels < 1) return -3;
      have_fmt = true;
    } else if (std::memcmp(cid, "data", 4) == 0) {
      *payload = body;
      *payload_len = csize;
    }
    pos += 8 + csize + (csize & 1);  // word-aligned
  }
  if (!have_fmt) return -2;
  if (*payload == nullptr) return -4;
  return 0;
}

inline float decode_sample(const uint8_t* p, uint16_t tag, uint16_t bits) {
  switch (tag) {
    case kPcm:
      switch (bits) {
        case 8:
          return (static_cast<float>(*p) - 128.0f) / 128.0f;
        case 16:
          return static_cast<float>(static_cast<int16_t>(rd16(p))) / 32768.0f;
        case 24: {
          int32_t v = static_cast<int32_t>(p[0]) |
                      (static_cast<int32_t>(p[1]) << 8) |
                      (static_cast<int32_t>(p[2]) << 16);
          v = (v ^ 0x800000) - 0x800000;  // sign extend
          return static_cast<float>(v) / 8388608.0f;
        }
        case 32: {
          int32_t v = static_cast<int32_t>(rd32(p));
          return static_cast<float>(static_cast<double>(v) / 2147483648.0);
        }
      }
      return 0.0f;
    case kFloat:
      if (bits == 32) {
        float f;
        std::memcpy(&f, p, 4);
        return f;
      } else if (bits == 64) {
        double d;
        std::memcpy(&d, p, 8);
        // match the numpy codec's nan_to_num(posinf=1, neginf=-1, nan=0):
        // a raw double->float cast of an out-of-range value is UB and
        // would feed non-finite samples into training on this path only
        if (std::isnan(d)) return 0.0f;
        if (d > 3.4028234663852886e38) return 1.0f;
        if (d < -3.4028234663852886e38) return -1.0f;
        return static_cast<float>(d);
      }
      return 0.0f;
  }
  return 0.0f;
}

}  // namespace

extern "C" {

// Inspect a wav buffer. Returns 0 ok / negative error; fills outputs.
int ta_wav_info(const uint8_t* data, int64_t len, int32_t* channels,
                int32_t* rate, int32_t* bits, int64_t* num_frames) {
  Fmt fmt;
  const uint8_t* payload;
  int64_t payload_len;
  int rc = parse(data, len, &fmt, &payload, &payload_len);
  if (rc != 0) return rc;
  if (fmt.tag != kPcm && fmt.tag != kFloat) return -5;
  // reject depths decode_sample has no case for — otherwise the decoder
  // would emit silence for them instead of deferring to the numpy codec's
  // WavFormatError (the two paths must stay behaviorally identical)
  if (fmt.tag == kPcm) {
    if (fmt.bits != 8 && fmt.bits != 16 && fmt.bits != 24 && fmt.bits != 32)
      return -7;
  } else {  // kFloat
    if (fmt.bits != 32 && fmt.bits != 64) return -7;
  }
  int64_t frame_bytes = static_cast<int64_t>(fmt.channels) * (fmt.bits / 8);
  if (frame_bytes <= 0) return -6;
  *channels = fmt.channels;
  *rate = static_cast<int32_t>(fmt.rate);
  *bits = fmt.bits;
  *num_frames = payload_len / frame_bytes;
  return 0;
}

// Decode to mono float32. mono_mode: 0 = mean of channels (librosa path),
// 1 = first channel (streaming path).  out must hold num_frames floats
// (from ta_wav_info).  Returns number of samples written, or negative error.
int64_t ta_decode_mono(const uint8_t* data, int64_t len, float* out,
                       int64_t out_cap, int32_t mono_mode) {
  Fmt fmt;
  const uint8_t* payload;
  int64_t payload_len;
  int rc = parse(data, len, &fmt, &payload, &payload_len);
  if (rc != 0) return rc;
  if (fmt.tag != kPcm && fmt.tag != kFloat) return -5;
  int bytes_per = fmt.bits / 8;
  if (bytes_per <= 0) return -6;
  int64_t frame_bytes = static_cast<int64_t>(fmt.channels) * bytes_per;
  int64_t n = payload_len / frame_bytes;
  if (n > out_cap) n = out_cap;
  const uint16_t tag = fmt.tag;
  const uint16_t bits = fmt.bits;
  const int ch = fmt.channels;

  if (ch == 1 || mono_mode == 1) {
    // single channel fast path (mono files or first-channel mixdown)
    if (tag == kFloat && bits == 32 && ch == 1) {
      std::memcpy(out, payload, static_cast<size_t>(n) * 4);
      return n;
    }
    for (int64_t i = 0; i < n; ++i) {
      out[i] = decode_sample(payload + i * frame_bytes, tag, bits);
    }
    return n;
  }
  // mean mixdown
  const float inv = 1.0f / static_cast<float>(ch);
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* fp = payload + i * frame_bytes;
    float acc = 0.0f;
    for (int c = 0; c < ch; ++c) {
      acc += decode_sample(fp + c * bytes_per, tag, bits);
    }
    out[i] = acc * inv;
  }
  return n;
}

// Version tag for the ctypes loader to sanity-check.
int ta_abi_version() { return 1; }

}  // extern "C"

extern "C" {

// Castagnoli CRC32C over a buffer (for the TensorBoard TFRecord framing —
// the pure-Python per-byte loop costs seconds on multi-MB audio events).
namespace {
// C++11 magic static: thread-safe one-time init (ctypes releases the GIL,
// so concurrent first calls from Python threads are real)
struct Crc32cTable {
  uint32_t t[256];
  Crc32cTable() {
    for (uint32_t n = 0; n < 256; ++n) {
      uint32_t c = n;
      for (int k = 0; k < 8; ++k) {
        c = (c & 1) ? (c >> 1) ^ 0x82F63B78u : c >> 1;
      }
      t[n] = c;
    }
  }
};
}  // namespace

uint32_t ta_crc32c(const uint8_t* data, int64_t len) {
  static const Crc32cTable tbl;
  const uint32_t* table = tbl.t;
  uint32_t crc = 0xFFFFFFFFu;
  for (int64_t i = 0; i < len; ++i) {
    crc = table[(crc ^ data[i]) & 0xFFu] ^ (crc >> 8);
  }
  return crc ^ 0xFFFFFFFFu;
}

}  // extern "C"
