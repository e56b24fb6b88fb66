// pexio — native audio I/O for pitchextractor_tpu.
//
// Fast RIFF/WAVE decode with partial reads, the role libsndfile plays in the
// reference data pipeline (meldataset.py:285-320).  Exposed as a C ABI for
// ctypes; the Python layer (pitchextractor_tpu/io/native.py) falls back to
// the pure-numpy codec when this library is not built.
//
// Supported encodings: PCM u8/s16/s24/s32, IEEE float32/float64, and
// WAVE_FORMAT_EXTENSIBLE wrappers.  Output is interleaved float32 in [-1, 1).
//
// Build: make -C native   (produces libpexio.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr uint16_t kFormatPcm = 0x0001;
constexpr uint16_t kFormatFloat = 0x0003;
constexpr uint16_t kFormatExtensible = 0xFFFE;

struct WavHeader {
  uint16_t format_tag = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  int64_t data_offset = 0;
  int64_t data_size = 0;
};

enum PexStatus : int32_t {
  kOk = 0,
  kOpenFailed = -1,
  kBadRiff = -2,
  kMissingFmt = -3,
  kMissingData = -4,
  kUnsupported = -5,
  kReadFailed = -6,
};

int32_t ScanHeader(FILE* f, WavHeader* h) {
  unsigned char riff[12];
  if (fread(riff, 1, 12, f) != 12 || memcmp(riff, "RIFF", 4) != 0 ||
      memcmp(riff + 8, "WAVE", 4) != 0) {
    return kBadRiff;
  }
  bool have_fmt = false;
  while (true) {
    unsigned char chunk[8];
    if (fread(chunk, 1, 8, f) != 8) break;
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (memcmp(chunk, "fmt ", 4) == 0) {
      std::vector<unsigned char> payload(size);
      if (fread(payload.data(), 1, size, f) != size) return kReadFailed;
      if (size < 16) return kMissingFmt;
      memcpy(&h->format_tag, payload.data() + 0, 2);
      memcpy(&h->channels, payload.data() + 2, 2);
      memcpy(&h->sample_rate, payload.data() + 4, 4);
      memcpy(&h->bits, payload.data() + 14, 2);
      if (h->format_tag == kFormatExtensible && size >= 40) {
        memcpy(&h->format_tag, payload.data() + 24, 2);
      }
      if (size % 2) fseek(f, 1, SEEK_CUR);
      have_fmt = true;
    } else if (memcmp(chunk, "data", 4) == 0) {
      h->data_offset = ftell(f);
      h->data_size = size;
      break;
    } else {
      fseek(f, static_cast<long>(size + (size % 2)), SEEK_CUR);
    }
  }
  if (!have_fmt) return kMissingFmt;
  if (h->data_offset == 0) return kMissingData;
  // clamp data size against actual file size (tolerate truncation)
  fseek(f, 0, SEEK_END);
  int64_t end = ftell(f);
  if (h->data_offset + h->data_size > end) h->data_size = end - h->data_offset;
  return kOk;
}

// Per-format conversion over the whole buffer — tight loops the compiler
// auto-vectorizes (the per-sample-switch variant benchmarked slower than
// numpy's frombuffer+scale; these beat it).
void ConvertSamples(const unsigned char* raw, int64_t n, uint16_t tag,
                    uint16_t bits, float* out) {
  if (tag == kFormatFloat && bits == 32) {
    memcpy(out, raw, static_cast<size_t>(n) * 4);
    return;
  }
  if (tag == kFormatFloat && bits == 64) {
    const double* src = reinterpret_cast<const double*>(raw);
    for (int64_t i = 0; i < n; ++i) out[i] = static_cast<float>(src[i]);
    return;
  }
  switch (bits) {
    case 8: {
      constexpr float kScale = 1.0f / 128.0f;
      for (int64_t i = 0; i < n; ++i)
        out[i] = (static_cast<int32_t>(raw[i]) - 128) * kScale;
      return;
    }
    case 16: {
      const int16_t* src = reinterpret_cast<const int16_t*>(raw);
      constexpr float kScale = 1.0f / 32768.0f;
      for (int64_t i = 0; i < n; ++i) out[i] = src[i] * kScale;
      return;
    }
    case 24: {
      constexpr float kScale = 1.0f / 8388608.0f;
      for (int64_t i = 0; i < n; ++i) {
        const unsigned char* p = raw + i * 3;
        int32_t v = p[0] | (p[1] << 8) | (p[2] << 16);
        v -= (v & 0x800000) << 1;
        out[i] = v * kScale;
      }
      return;
    }
    case 32: {
      const int32_t* src = reinterpret_cast<const int32_t*>(raw);
      constexpr float kScale = 1.0f / 2147483648.0f;
      for (int64_t i = 0; i < n; ++i) out[i] = src[i] * kScale;
      return;
    }
  }
}

}  // namespace

extern "C" {

// Header-only metadata. Returns PexStatus.
int32_t pexio_info(const char* path, int64_t* frames, int32_t* sample_rate,
                   int32_t* channels, int32_t* bits) {
  FILE* f = fopen(path, "rb");
  if (!f) return kOpenFailed;
  WavHeader h;
  int32_t status = ScanHeader(f, &h);
  fclose(f);
  if (status != kOk) return status;
  int64_t frame_bytes = static_cast<int64_t>(h.channels) * (h.bits / 8);
  if (frame_bytes <= 0) return kUnsupported;
  *frames = h.data_size / frame_bytes;
  *sample_rate = static_cast<int32_t>(h.sample_rate);
  *channels = h.channels;
  *bits = h.bits;
  return kOk;
}

// Decode [start, start+max_frames) interleaved float32 into out (caller
// allocates max_frames * channels floats). Writes the decoded frame count to
// out_frames. Returns PexStatus.
int32_t pexio_read_f32(const char* path, int64_t start, int64_t max_frames,
                       float* out, int64_t* out_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return kOpenFailed;
  WavHeader h;
  int32_t status = ScanHeader(f, &h);
  if (status != kOk) {
    fclose(f);
    return status;
  }
  const int64_t bytes_per_sample = h.bits / 8;
  const int64_t frame_bytes = static_cast<int64_t>(h.channels) * bytes_per_sample;
  if (frame_bytes <= 0 ||
      !((h.format_tag == kFormatPcm && (h.bits == 8 || h.bits == 16 || h.bits == 24 || h.bits == 32)) ||
        (h.format_tag == kFormatFloat && (h.bits == 32 || h.bits == 64)))) {
    fclose(f);
    return kUnsupported;
  }
  const int64_t total_frames = h.data_size / frame_bytes;
  if (start < 0) start = 0;
  int64_t count = total_frames - start;
  if (count < 0) count = 0;
  if (max_frames >= 0 && count > max_frames) count = max_frames;

  if (count > 0) {
    if (fseek(f, static_cast<long>(h.data_offset + start * frame_bytes), SEEK_SET) != 0) {
      fclose(f);
      return kReadFailed;
    }
    std::vector<unsigned char> raw(static_cast<size_t>(count * frame_bytes));
    size_t got = fread(raw.data(), 1, raw.size(), f);
    int64_t got_frames = static_cast<int64_t>(got) / frame_bytes;
    ConvertSamples(raw.data(), got_frames * h.channels, h.format_tag, h.bits, out);
    count = got_frames;
  }
  fclose(f);
  *out_frames = count;
  return kOk;
}

}  // extern "C"
