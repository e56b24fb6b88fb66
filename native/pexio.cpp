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

// Decode [start, start+max_frames) interleaved float32. Returns PexStatus.
int32_t DecodeSegment(const char* path, int64_t start, int64_t max_frames,
                      std::vector<float>* out, int32_t* sr, int32_t* channels) {
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
