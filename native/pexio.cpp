// pexio — native audio I/O for pitchextractor_tpu.
//
// Fast RIFF/WAVE decode with partial reads, the role libsndfile plays in the
// reference data pipeline (meldataset.py:285-320), plus a prefetch thread
// pool that pipelines decode → mono downmix → polyphase resample off the
// Python thread (the role of the reference's DataLoader worker *processes*,
// meldataset.py:852-863, without pickling or fork/CUDA hazards).  Exposed as
// a C ABI for ctypes; the Python layer (pitchextractor_tpu/io/native.py)
// falls back to the pure-numpy codec when this library is not built.
//
// Supported encodings: PCM u8/s16/s24/s32, IEEE float32/float64, and
// WAVE_FORMAT_EXTENSIBLE wrappers.  Output is interleaved float32 in [-1, 1).
//
// Resampling uses caller-registered polyphase kernels (the Python side
// passes the exact torchaudio-parity kernel from dsp/resample.py), so the
// native pipeline is numerically the same resampler as the host path.
//
// Build: make -C native   (produces libpexio.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
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
  kMissingKernel = -7,
  kBadJob = -8,
  kCapacity = -9,
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

int32_t FlacDecodeSegment(const char* path, int64_t start, int64_t max_frames,
                          std::vector<float>* out, int32_t* sr, int32_t* channels);
bool IsFlacFile(const char* path);

// Decode [start, start+max_frames) interleaved float32. Returns PexStatus.
int32_t DecodeSegment(const char* path, int64_t start, int64_t max_frames,
                      std::vector<float>* out, int32_t* sr, int32_t* channels) {
  if (IsFlacFile(path)) return FlacDecodeSegment(path, start, max_frames, out, sr, channels);
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
    out->resize(static_cast<size_t>(got_frames * h.channels));
    ConvertSamples(raw.data(), got_frames * h.channels, h.format_tag, h.bits, out->data());
  } else {
    out->clear();
  }
  fclose(f);
  *sr = static_cast<int32_t>(h.sample_rate);
  *channels = h.channels;
  return kOk;
}

// ---------------------------------------------------------------------------
// FLAC decode (RFC 9639) — native port of pitchextractor_tpu/io/flac.py so
// real corpora (VCTK ships FLAC) decode at native speed in the prefetch
// pool and the partial-read path.  Same coverage as the Python decoder:
// STREAMINFO/SEEKTABLE, CONSTANT/VERBATIM/FIXED/LPC subframes, wasted bits,
// Rice/Rice2 residuals with escapes, all stereo decorrelation modes,
// CRC-8/16 verified, decode-from-nearest-seek-point partial reads.

struct FlacInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bits = 0;
  uint64_t total_samples = 0;
  int64_t first_frame_offset = 0;
  uint32_t max_blocksize = 0;
  std::vector<std::pair<uint64_t, uint64_t>> seek_points;  // (sample, offset)
};

class BitReader {
 public:
  BitReader(const unsigned char* data, size_t size, size_t pos)
      : data_(data), size_(size), pos_(pos) {}

  bool ok() const { return ok_; }
  size_t byte_position() const { return pos_ - nbits_ / 8; }

  uint64_t Read(int n) {
    if (n == 0) return 0;
    Fill(n);
    if (!ok_) return 0;
    nbits_ -= n;
    uint64_t out = acc_ >> nbits_;
    acc_ &= (nbits_ ? ((~0ULL) >> (64 - nbits_)) : 0ULL);
    return out;
  }

  int64_t ReadSigned(int n) {
    uint64_t v = Read(n);
    if (n > 0 && (v & (1ULL << (n - 1)))) return static_cast<int64_t>(v) - (1LL << n);
    return static_cast<int64_t>(v);
  }

  int64_t ReadUnary() {
    int64_t count = 0;
    for (;;) {
      if (nbits_ == 0) {
        Fill(1);
        if (!ok_) return 0;
      }
      if (acc_ == 0) {
        count += nbits_;
        nbits_ = 0;
        continue;
      }
      int lead = nbits_ - (64 - __builtin_clzll(acc_));
      count += lead;
      nbits_ -= lead + 1;
      acc_ &= (nbits_ ? ((~0ULL) >> (64 - nbits_)) : 0ULL);
      return count;
    }
  }

  void Align() {
    int drop = nbits_ % 8;
    nbits_ -= drop;
    acc_ &= (nbits_ ? ((~0ULL) >> (64 - nbits_)) : 0ULL);
  }

 private:
  void Fill(int need) {
    while (nbits_ < need) {
      if (pos_ >= size_) {
        ok_ = false;
        return;
      }
      // keep headroom so acc_ never overflows 64 bits
      if (nbits_ > 56) return;
      acc_ = (acc_ << 8) | data_[pos_++];
      nbits_ += 8;
    }
  }

  const unsigned char* data_;
  size_t size_;
  size_t pos_;
  uint64_t acc_ = 0;
  int nbits_ = 0;
  bool ok_ = true;
};

uint8_t FlacCrc8(const unsigned char* data, size_t n) {
  static uint8_t table[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; ++i) {
      uint8_t c = static_cast<uint8_t>(i);
      for (int b = 0; b < 8; ++b) c = (c & 0x80) ? static_cast<uint8_t>((c << 1) ^ 0x07) : static_cast<uint8_t>(c << 1);
      table[i] = c;
    }
    init = true;
  }
  uint8_t c = 0;
  for (size_t i = 0; i < n; ++i) c = table[c ^ data[i]];
  return c;
}

uint16_t FlacCrc16(const unsigned char* data, size_t n) {
  static uint16_t table[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; ++i) {
      uint16_t c = static_cast<uint16_t>(i << 8);
      for (int b = 0; b < 8; ++b) c = (c & 0x8000) ? static_cast<uint16_t>((c << 1) ^ 0x8005) : static_cast<uint16_t>(c << 1);
      table[i] = c;
    }
    init = true;
  }
  uint16_t c = 0;
  for (size_t i = 0; i < n; ++i) c = static_cast<uint16_t>(table[((c >> 8) ^ data[i]) & 0xFF] ^ (c << 8));
  return c;
}

bool FlacParseMetadata(const unsigned char* data, size_t size, FlacInfo* info) {
  if (size < 8 || memcmp(data, "fLaC", 4) != 0) return false;
  size_t pos = 4;
  bool have_si = false;
  for (;;) {
    if (pos + 4 > size) return false;
    bool last = data[pos] & 0x80;
    int btype = data[pos] & 0x7F;
    uint32_t length = (data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
    if (pos + 4 + length > size) return false;
    const unsigned char* payload = data + pos + 4;
    if (btype == 0 && length >= 34) {
      BitReader br(payload, length, 0);
      br.Read(16);  // min blocksize
      info->max_blocksize = static_cast<uint32_t>(br.Read(16));
      br.Read(24);
      br.Read(24);
      info->sample_rate = static_cast<uint32_t>(br.Read(20));
      info->channels = static_cast<uint32_t>(br.Read(3)) + 1;
      info->bits = static_cast<uint32_t>(br.Read(5)) + 1;
      info->total_samples = br.Read(36);
      have_si = true;
    } else if (btype == 3) {
      for (uint32_t i = 0; i + 18 <= length; i += 18) {
        uint64_t sample = 0, offset = 0;
        for (int b = 0; b < 8; ++b) sample = (sample << 8) | payload[i + b];
        for (int b = 0; b < 8; ++b) offset = (offset << 8) | payload[i + 8 + b];
        if (sample != 0xFFFFFFFFFFFFFFFFULL) info->seek_points.emplace_back(sample, offset);
      }
    }
    pos += 4 + length;
    if (last) break;
  }
  info->first_frame_offset = static_cast<int64_t>(pos);
  return have_si;
}

bool FlacReadUtf8(BitReader* br, uint64_t* value) {
  uint64_t first = br->Read(8);
  if (first < 0x80) {
    *value = first;
    return br->ok();
  }
  int n = 0;
  uint64_t probe = first;
  while (probe & 0x40) {
    ++n;
    probe <<= 1;
  }
  if (n == 0) return false;
  uint64_t v = first & (0x3FULL >> n);
  for (int i = 0; i < n; ++i) {
    uint64_t cont = br->Read(8);
    if ((cont & 0xC0) != 0x80) return false;
    v = (v << 6) | (cont & 0x3F);
  }
  *value = v;
  return br->ok();
}

bool FlacDecodeResidual(BitReader* br, int blocksize, int order, int64_t* out) {
  int method = static_cast<int>(br->Read(2));
  if (method > 1) return false;
  int pbits = method == 0 ? 4 : 5;
  uint64_t escape = (1ULL << pbits) - 1;
  int porder = static_cast<int>(br->Read(4));
  int nparts = 1 << porder;
  if (blocksize % nparts) return false;
  int idx = 0;
  for (int p = 0; p < nparts; ++p) {
    int count = blocksize / nparts - (p == 0 ? order : 0);
    if (count < 0) return false;
    uint64_t k = br->Read(pbits);
    if (k == escape) {
      int raw = static_cast<int>(br->Read(5));
      for (int i = 0; i < count; ++i) out[idx++] = raw ? br->ReadSigned(raw) : 0;
    } else {
      for (int i = 0; i < count; ++i) {
        uint64_t q = static_cast<uint64_t>(br->ReadUnary());
        uint64_t u = (q << k) | br->Read(static_cast<int>(k));
        out[idx++] = static_cast<int64_t>(u >> 1) ^ -static_cast<int64_t>(u & 1);
      }
    }
  }
  return br->ok();
}

const int kFlacFixedCoeffs[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool FlacDecodeSubframe(BitReader* br, int blocksize, int bps, int64_t* out,
                        std::vector<int64_t>* scratch) {
  if (br->Read(1)) return false;
  int stype = static_cast<int>(br->Read(6));
  int wasted = 0;
  if (br->Read(1)) {
    wasted = 1 + static_cast<int>(br->ReadUnary());
    bps -= wasted;
  }
  if (bps <= 0 || bps > 33) return false;

  if (stype == 0) {
    int64_t v = br->ReadSigned(bps);
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (stype == 1) {
    for (int i = 0; i < blocksize; ++i) out[i] = br->ReadSigned(bps);
  } else if (stype >= 8 && stype <= 12) {
    int order = stype - 8;
    for (int i = 0; i < order; ++i) out[i] = br->ReadSigned(bps);
    scratch->resize(static_cast<size_t>(blocksize - order));
    if (!FlacDecodeResidual(br, blocksize, order, scratch->data())) return false;
    const int* cf = kFlacFixedCoeffs[order];
    if (order == 0) {
      for (int i = 0; i < blocksize; ++i) out[i] = (*scratch)[static_cast<size_t>(i)];
    } else {
      for (int i = order; i < blocksize; ++i) {
        int64_t acc = (*scratch)[static_cast<size_t>(i - order)];
        for (int j = 0; j < order; ++j) acc += cf[j] * out[i - 1 - j];
        out[i] = acc;
      }
    }
  } else if (stype >= 32) {
    int order = stype - 31;
    for (int i = 0; i < order; ++i) out[i] = br->ReadSigned(bps);
    int precision = static_cast<int>(br->Read(4)) + 1;
    if (precision == 16) return false;
    int shift = static_cast<int>(br->ReadSigned(5));
    if (shift < 0) return false;
    int64_t coefs[32];
    for (int i = 0; i < order; ++i) coefs[i] = br->ReadSigned(precision);
    scratch->resize(static_cast<size_t>(blocksize - order));
    if (!FlacDecodeResidual(br, blocksize, order, scratch->data())) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coefs[j] * out[i - 1 - j];
      out[i] = (*scratch)[static_cast<size_t>(i - order)] + (acc >> shift);
    }
  } else {
    return false;
  }
  if (wasted) {
    for (int i = 0; i < blocksize; ++i) out[i] <<= wasted;
  }
  return br->ok();
}

// Decode one frame starting at byte_pos; appends interleaved float32 rows.
// Returns the frame's end byte (0 on failure) and sets *blocksize.
size_t FlacDecodeFrame(const unsigned char* data, size_t size, size_t byte_pos,
                       const FlacInfo& info, std::vector<std::vector<int64_t>>* chans,
                       int* blocksize_out) {
  static const int kBlock[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2,
                                 256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
  static const int kBits[8] = {0, 8, 12, -1, 16, 20, 24, 32};
  BitReader br(data, size, byte_pos);
  if (br.Read(14) != 0x3FFE) return 0;
  if (br.Read(1)) return 0;
  br.Read(1);  // blocking strategy (frame/sample number — value unused here)
  int bs_code = static_cast<int>(br.Read(4));
  int rate_code = static_cast<int>(br.Read(4));
  int chan_code = static_cast<int>(br.Read(4));
  int size_code = static_cast<int>(br.Read(3));
  if (br.Read(1)) return 0;
  uint64_t number;
  if (!FlacReadUtf8(&br, &number)) return 0;

  int blocksize;
  if (bs_code == 0) return 0;
  else if (bs_code == 6) blocksize = static_cast<int>(br.Read(8)) + 1;
  else if (bs_code == 7) blocksize = static_cast<int>(br.Read(16)) + 1;
  else blocksize = kBlock[bs_code];

  if (rate_code == 12) br.Read(8);
  else if (rate_code == 13 || rate_code == 14) br.Read(16);
  else if (rate_code == 15) return 0;

  int bps = size_code == 0 ? static_cast<int>(info.bits) : kBits[size_code];
  if (bps <= 0) return 0;

  size_t hdr_end = br.byte_position();
  if (FlacCrc8(data + byte_pos, hdr_end - byte_pos) != br.Read(8)) return 0;

  int channels = chan_code < 8 ? chan_code + 1 : 2;
  if (channels != static_cast<int>(info.channels)) return 0;
  chans->resize(static_cast<size_t>(channels));
  std::vector<int64_t> scratch;
  for (int c = 0; c < channels; ++c) {
    int ch_bps = bps;
    if ((chan_code == 8 && c == 1) || (chan_code == 9 && c == 0) ||
        (chan_code == 10 && c == 1)) {
      ch_bps += 1;  // side channel
    }
    (*chans)[static_cast<size_t>(c)].resize(static_cast<size_t>(blocksize));
    if (!FlacDecodeSubframe(&br, blocksize, ch_bps,
                            (*chans)[static_cast<size_t>(c)].data(), &scratch)) {
      return 0;
    }
  }
  // stereo decorrelation
  if (chan_code == 8) {  // left-side
    for (int i = 0; i < blocksize; ++i)
      (*chans)[1][static_cast<size_t>(i)] = (*chans)[0][static_cast<size_t>(i)] - (*chans)[1][static_cast<size_t>(i)];
  } else if (chan_code == 9) {  // side-right
    for (int i = 0; i < blocksize; ++i)
      (*chans)[0][static_cast<size_t>(i)] += (*chans)[1][static_cast<size_t>(i)];
  } else if (chan_code == 10) {  // mid-side
    for (int i = 0; i < blocksize; ++i) {
      int64_t side = (*chans)[1][static_cast<size_t>(i)];
      int64_t left = (*chans)[0][static_cast<size_t>(i)] * 2 + (side & 1) + side;
      (*chans)[0][static_cast<size_t>(i)] = left >> 1;
      (*chans)[1][static_cast<size_t>(i)] = (left >> 1) - side;
    }
  } else if (chan_code > 10) {
    return 0;
  }
  br.Align();
  size_t body_end = br.byte_position();
  if (!br.ok() || body_end + 2 > size) return 0;
  uint16_t footer = static_cast<uint16_t>((data[body_end] << 8) | data[body_end + 1]);
  if (FlacCrc16(data + byte_pos, body_end - byte_pos) != footer) return 0;
  *blocksize_out = blocksize;
  return body_end + 2;
}

// Decode [start, start+max_frames) of a FLAC file as interleaved float32.
int32_t FlacDecodeSegment(const char* path, int64_t start, int64_t max_frames,
                          std::vector<float>* out, int32_t* sr, int32_t* channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return kOpenFailed;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> data(static_cast<size_t>(fsize));
  size_t got = fread(data.data(), 1, data.size(), f);
  fclose(f);
  data.resize(got);

  FlacInfo info;
  if (!FlacParseMetadata(data.data(), data.size(), &info)) return kBadRiff;
  if (info.bits < 4 || info.bits > 32 || info.channels < 1) return kUnsupported;
  const int64_t total = static_cast<int64_t>(info.total_samples);
  if (start < 0) start = 0;
  int64_t count = total - start;
  if (count < 0) count = 0;
  if (max_frames >= 0 && count > max_frames) count = max_frames;
  *sr = static_cast<int32_t>(info.sample_rate);
  *channels = static_cast<int32_t>(info.channels);
  out->clear();
  if (count == 0) return kOk;
  out->reserve(static_cast<size_t>(count * info.channels));

  size_t byte_pos = static_cast<size_t>(info.first_frame_offset);
  int64_t sample_pos = 0;
  for (const auto& sp : info.seek_points) {
    if (static_cast<int64_t>(sp.first) <= start) {
      byte_pos = static_cast<size_t>(info.first_frame_offset + static_cast<int64_t>(sp.second));
      sample_pos = static_cast<int64_t>(sp.first);
    } else {
      break;
    }
  }

  const float scale = 1.0f / static_cast<float>(1LL << (info.bits - 1));
  std::vector<std::vector<int64_t>> chans;
  int64_t want = count;
  while (byte_pos + 2 <= data.size() && want > 0) {
    int blocksize = 0;
    size_t next = FlacDecodeFrame(data.data(), data.size(), byte_pos, info, &chans, &blocksize);
    if (next == 0) return kReadFailed;
    int64_t lo = start - sample_pos;
    if (lo < 0) lo = 0;
    if (lo < blocksize) {
      int64_t hi = blocksize;
      if (hi - lo > want) hi = lo + want;
      for (int64_t i = lo; i < hi; ++i) {
        for (uint32_t c = 0; c < info.channels; ++c) {
          out->push_back(static_cast<float>(chans[c][static_cast<size_t>(i)]) * scale);
        }
      }
      want -= hi - lo;
    }
    sample_pos += blocksize;
    byte_pos = next;
    if (total && sample_pos >= total) break;
  }
  return kOk;
}

bool IsFlacFile(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[4] = {0};
  size_t got = fread(magic, 1, 4, f);
  fclose(f);
  return got == 4 && memcmp(magic, "fLaC", 4) == 0;
}

int64_t Gcd(int64_t a, int64_t b) { return b == 0 ? a : Gcd(b, a % b); }

struct ResampleKernel {
  int32_t orig = 0;   // reduced source rate
  int32_t out = 0;    // reduced target rate (polyphase count)
  int32_t taps = 0;   // 2*width + orig
  int32_t width = 0;  // kernel half-width in source samples
  std::vector<double> data;  // (out, taps) row-major
};

// Mirror of dsp/resample.py::resample_np: pad (width, width+orig), strided
// windows every `orig` samples, (windows @ kernel.T) interleaved, trimmed to
// ceil(new * n / orig).  Double accumulation matches the numpy float64 path.
void ResampleMono(const std::vector<float>& x, const ResampleKernel& k,
                  std::vector<float>* result) {
  const int64_t n = static_cast<int64_t>(x.size());
  const int64_t target = (static_cast<int64_t>(k.out) * n + k.orig - 1) / k.orig;
  std::vector<double> padded(static_cast<size_t>(n + 2 * k.width + k.orig), 0.0);
  for (int64_t i = 0; i < n; ++i) padded[static_cast<size_t>(k.width + i)] = x[static_cast<size_t>(i)];
  const int64_t num_windows = (static_cast<int64_t>(padded.size()) - k.taps) / k.orig + 1;
  result->assign(static_cast<size_t>(target), 0.0f);
  for (int64_t w = 0; w < num_windows; ++w) {
    const double* src = padded.data() + w * k.orig;
    for (int32_t p = 0; p < k.out; ++p) {
      const int64_t out_idx = w * k.out + p;
      if (out_idx >= target) break;
      const double* kr = k.data.data() + static_cast<size_t>(p) * k.taps;
      double acc = 0.0;
      for (int32_t t = 0; t < k.taps; ++t) acc += src[t] * kr[t];
      (*result)[static_cast<size_t>(out_idx)] = static_cast<float>(acc);
    }
  }
}

struct PrefetchJob {
  std::string path;
  int64_t start = 0;
  int64_t max_frames = -1;
  int32_t target_sr = 0;  // 0 = keep native rate
  // results
  bool done = false;
  int32_t status = kOk;
  int32_t sample_rate = 0;
  std::vector<float> mono;
};

struct PrefetchPool {
  std::mutex mu;
  std::condition_variable work_cv;   // workers wait for jobs
  std::condition_variable done_cv;   // callers wait for results
  std::deque<int64_t> queue;
  std::map<int64_t, std::unique_ptr<PrefetchJob>> jobs;
  std::map<int64_t, ResampleKernel> kernels;  // keyed by (orig << 32) | out
  std::vector<std::thread> workers;
  int64_t next_id = 0;
  bool stop = false;

  static int64_t KernelKey(int32_t orig, int32_t out) {
    return (static_cast<int64_t>(orig) << 32) | static_cast<uint32_t>(out);
  }

  void Run() {
    for (;;) {
      PrefetchJob* job = nullptr;
      {
        std::unique_lock<std::mutex> lock(mu);
        work_cv.wait(lock, [&] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        int64_t id = queue.front();
        queue.pop_front();
        auto it = jobs.find(id);
        if (it == jobs.end()) continue;
        job = it->second.get();
      }
      Execute(job);
      {
        std::lock_guard<std::mutex> lock(mu);
        job->done = true;
      }
      done_cv.notify_all();
    }
  }

  void Execute(PrefetchJob* job) {
    std::vector<float> interleaved;
    int32_t sr = 0, channels = 0;
    job->status = DecodeSegment(job->path.c_str(), job->start, job->max_frames,
                                &interleaved, &sr, &channels);
    if (job->status != kOk) return;
    // mono downmix (mean over channels, matching np.mean(wave, axis=-1))
    const int64_t frames = channels > 0 ? static_cast<int64_t>(interleaved.size()) / channels : 0;
    std::vector<float> mono(static_cast<size_t>(frames));
    if (channels == 1) {
      mono.assign(interleaved.begin(), interleaved.end());
    } else {
      const float inv = channels > 0 ? 1.0f / channels : 0.0f;
      for (int64_t i = 0; i < frames; ++i) {
        double acc = 0.0;
        for (int32_t c = 0; c < channels; ++c) acc += interleaved[static_cast<size_t>(i * channels + c)];
        mono[static_cast<size_t>(i)] = static_cast<float>(acc * inv);
      }
    }
    job->sample_rate = sr;
    if (job->target_sr <= 0 || job->target_sr == sr) {
      job->mono = std::move(mono);
      return;
    }
    const int64_t g = Gcd(sr, job->target_sr);
    const int32_t orig = static_cast<int32_t>(sr / g);
    const int32_t out = static_cast<int32_t>(job->target_sr / g);
    ResampleKernel kernel;
    {
      std::lock_guard<std::mutex> lock(mu);
      auto it = kernels.find(KernelKey(orig, out));
      if (it == kernels.end()) {
        job->status = kMissingKernel;
        job->mono = std::move(mono);  // caller can still fetch + resample host-side
        return;
      }
      kernel = it->second;  // copy so the lock is not held during compute
    }
    ResampleMono(mono, kernel, &job->mono);
    job->sample_rate = job->target_sr;
  }
};

}  // namespace

extern "C" {

// Header-only metadata. Returns PexStatus.
int32_t pexio_info(const char* path, int64_t* frames, int32_t* sample_rate,
                   int32_t* channels, int32_t* bits) {
  if (IsFlacFile(path)) {
    FILE* f = fopen(path, "rb");
    if (!f) return kOpenFailed;
    // metadata normally sits well within the first 64 KiB
    std::vector<unsigned char> head(64 * 1024);
    size_t got = fread(head.data(), 1, head.size(), f);
    head.resize(got);
    FlacInfo fi;
    if (!FlacParseMetadata(head.data(), head.size(), &fi)) {
      fseek(f, 0, SEEK_END);
      long fsize = ftell(f);
      fseek(f, 0, SEEK_SET);
      head.resize(static_cast<size_t>(fsize));
      got = fread(head.data(), 1, head.size(), f);
      head.resize(got);
      if (!FlacParseMetadata(head.data(), head.size(), &fi)) {
        fclose(f);
        return kBadRiff;
      }
    }
    fclose(f);
    *frames = static_cast<int64_t>(fi.total_samples);
    *sample_rate = static_cast<int32_t>(fi.sample_rate);
    *channels = static_cast<int32_t>(fi.channels);
    *bits = static_cast<int32_t>(fi.bits);
    return kOk;
  }
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
  if (IsFlacFile(path)) {
    std::vector<float> decoded;
    int32_t sr = 0, channels = 0;
    int32_t status = FlacDecodeSegment(path, start, max_frames, &decoded, &sr, &channels);
    if (status != kOk) return status;
    if (!decoded.empty()) memcpy(out, decoded.data(), decoded.size() * sizeof(float));
    *out_frames = channels > 0 ? static_cast<int64_t>(decoded.size()) / channels : 0;
    return kOk;
  }
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

// ---------------------------------------------------------------------------
// Prefetch thread pool: decode → mono downmix → polyphase resample off the
// Python thread.  All calls are thread-safe; ctypes releases the GIL around
// them so `wait` overlaps Python-side work with native decoding.

void* pexio_pool_create(int32_t n_threads) {
  auto* pool = new PrefetchPool();
  if (n_threads < 1) n_threads = 1;
  pool->workers.reserve(static_cast<size_t>(n_threads));
  for (int32_t i = 0; i < n_threads; ++i) {
    pool->workers.emplace_back([pool] { pool->Run(); });
  }
  return pool;
}

void pexio_pool_destroy(void* handle) {
  auto* pool = static_cast<PrefetchPool*>(handle);
  if (!pool) return;
  {
    std::lock_guard<std::mutex> lock(pool->mu);
    pool->stop = true;
  }
  pool->work_cv.notify_all();
  for (auto& t : pool->workers) t.join();
  delete pool;
}

// Register the (reduced) orig->out polyphase kernel, (out, taps) row-major
// float64 — the exact kernel dsp/resample.py builds for torchaudio parity.
int32_t pexio_pool_set_kernel(void* handle, int32_t orig, int32_t out,
                              int32_t width, const double* kernel, int32_t taps) {
  auto* pool = static_cast<PrefetchPool*>(handle);
  if (!pool || orig <= 0 || out <= 0 || taps <= 0) return kBadJob;
  ResampleKernel k;
  k.orig = orig;
  k.out = out;
  k.taps = taps;
  k.width = width;
  k.data.assign(kernel, kernel + static_cast<size_t>(out) * taps);
  std::lock_guard<std::mutex> lock(pool->mu);
  pool->kernels[PrefetchPool::KernelKey(orig, out)] = std::move(k);
  return kOk;
}

// Enqueue a decode(+resample to target_sr when > 0) job; returns job id.
int64_t pexio_pool_submit(void* handle, const char* path, int64_t start,
                          int64_t max_frames, int32_t target_sr) {
  auto* pool = static_cast<PrefetchPool*>(handle);
  if (!pool || !path) return -1;
  auto job = std::unique_ptr<PrefetchJob>(new PrefetchJob());
  job->path = path;
  job->start = start;
  job->max_frames = max_frames;
  job->target_sr = target_sr;
  int64_t id;
  {
    std::lock_guard<std::mutex> lock(pool->mu);
    id = pool->next_id++;
    pool->jobs[id] = std::move(job);
    pool->queue.push_back(id);
  }
  pool->work_cv.notify_one();
  return id;
}

// Block until the job finishes; report its status, output length (mono
// samples) and sample rate.  The job stays fetchable afterwards.
int32_t pexio_pool_wait(void* handle, int64_t id, int64_t* out_samples,
                        int32_t* out_sr) {
  auto* pool = static_cast<PrefetchPool*>(handle);
  if (!pool) return kBadJob;
  std::unique_lock<std::mutex> lock(pool->mu);
  auto it = pool->jobs.find(id);
  if (it == pool->jobs.end()) return kBadJob;
  PrefetchJob* job = it->second.get();
  pool->done_cv.wait(lock, [&] { return job->done; });
  *out_samples = static_cast<int64_t>(job->mono.size());
  *out_sr = job->sample_rate;
  return job->status;
}

// Copy the finished job's mono float32 audio into `out` and free the job.
int32_t pexio_pool_fetch(void* handle, int64_t id, float* out, int64_t capacity) {
  auto* pool = static_cast<PrefetchPool*>(handle);
  if (!pool) return kBadJob;
  std::unique_ptr<PrefetchJob> job;
  {
    std::lock_guard<std::mutex> lock(pool->mu);
    auto it = pool->jobs.find(id);
    if (it == pool->jobs.end()) return kBadJob;
    if (!it->second->done) return kBadJob;
    job = std::move(it->second);
    pool->jobs.erase(it);
  }
  if (static_cast<int64_t>(job->mono.size()) > capacity) return kCapacity;
  if (!job->mono.empty()) {
    memcpy(out, job->mono.data(), job->mono.size() * sizeof(float));
  }
  return job->status;
}

}  // extern "C"
