// Native host-side audio IO for the data pipeline.
//
// The reference decodes/resamples audio in Python (librosa inside 12 DataLoader
// worker processes — reference processor.py:74-97, trainer_unfreeze.py:1429).
// Here the host runtime is a small C++ library: WAV decoding (PCM 8/16/24/32 and
// IEEE float, mono-mix), windowed-sinc resampling, and parallel batch
// padding/peak-normalisation. Exposed through a C ABI and loaded from Python via
// ctypes (speech_transcript_embeddings_tpu/data/native_audio.py), with a pure
// Python/scipy fallback when the toolchain is unavailable.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libste_audio.so audio_io.cpp -lpthread

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

struct Reader {
  const uint8_t* p;
  long n;
  long off = 0;
  bool ok = true;

  uint32_t u32() {
    if (off + 4 > n) { ok = false; return 0; }
    uint32_t v;
    std::memcpy(&v, p + off, 4);
    off += 4;
    return v;
  }
  uint16_t u16() {
    if (off + 2 > n) { ok = false; return 0; }
    uint16_t v;
    std::memcpy(&v, p + off, 2);
    off += 2;
    return v;
  }
  bool tag(const char* t) {
    if (off + 4 > n) return false;
    bool m = std::memcmp(p + off, t, 4) == 0;
    off += 4;
    return m;
  }
};

constexpr double kPi = 3.14159265358979323846;

}  // namespace

extern "C" {

// Decode a RIFF/WAVE buffer. Two-call protocol: with out == nullptr returns the
// decoded mono sample count and writes *sample_rate; with out != nullptr writes
// up to out_capacity mono float samples. Negative return = error:
//   -1 malformed header, -2 unsupported format, -3 missing data chunk.
long ste_decode_wav(const uint8_t* data, long size, float* out,
                    long out_capacity, int* sample_rate) {
  Reader r{data, size};
  if (!r.tag("RIFF")) return -1;
  r.u32();  // riff size
  if (!r.tag("WAVE")) return -1;

  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* pcm = nullptr;
  long pcm_bytes = 0;

  while (r.ok && r.off + 8 <= r.n) {
    char id[4];
    std::memcpy(id, r.p + r.off, 4);
    r.off += 4;
    uint32_t chunk = r.u32();
    if (!r.ok) break;
    if (std::memcmp(id, "fmt ", 4) == 0) {
      long fmt_end = r.off + chunk;
      fmt = r.u16();
      channels = r.u16();
      rate = r.u32();
      r.u32();  // byte rate
      r.u16();  // block align
      bits = r.u16();
      if (fmt == 0xFFFE && r.off + 8 <= fmt_end) {  // WAVE_FORMAT_EXTENSIBLE
        r.u16();                                     // cbSize
        r.u16();                                     // valid bits
        r.u32();                                     // channel mask
        fmt = r.u16();                               // subformat GUID leads with the tag
      }
      r.off = fmt_end;
    } else if (std::memcmp(id, "data", 4) == 0) {
      pcm = r.p + r.off;
      pcm_bytes = std::min<long>(chunk, r.n - r.off);
      r.off += chunk;
    } else {
      r.off += chunk + (chunk & 1);  // chunks are word-aligned
    }
    if (pcm && rate) break;
  }
  if (!rate || !channels || !bits) return -1;
  if (!pcm) return -3;
  if (fmt != 1 && fmt != 3) return -2;  // PCM or IEEE float
  if (fmt == 1 && bits != 8 && bits != 16 && bits != 24 && bits != 32) return -2;
  if (fmt == 3 && bits != 32 && bits != 64) return -2;

  const long bytes_per = bits / 8;
  const long frames = pcm_bytes / (bytes_per * channels);
  if (sample_rate) *sample_rate = static_cast<int>(rate);
  if (!out) return frames;

  const long n_out = std::min<long>(frames, out_capacity);
  const double inv_ch = 1.0 / channels;
  for (long i = 0; i < n_out; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* s = pcm + (i * channels + c) * bytes_per;
      double v = 0.0;
      if (fmt == 3 && bits == 32) {
        float f;
        std::memcpy(&f, s, 4);
        v = f;
      } else if (fmt == 3 && bits == 64) {
        double d;
        std::memcpy(&d, s, 8);
        v = d;
      } else if (bits == 16) {
        int16_t x;
        std::memcpy(&x, s, 2);
        v = x / 32768.0;
      } else if (bits == 8) {
        v = (s[0] - 128) / 128.0;
      } else if (bits == 24) {
        int32_t x = (s[0] << 8) | (s[1] << 16) | (int32_t(int8_t(s[2])) << 24);
        v = (x >> 8) / 8388608.0;
      } else {  // 32-bit PCM
        int32_t x;
        std::memcpy(&x, s, 4);
        v = x / 2147483648.0;
      }
      acc += v;
    }
    out[i] = static_cast<float>(acc * inv_ch);
  }
  return n_out;
}

// Windowed-sinc (Hann, 16 taps per side) polyphase-quality resampler.
// Returns the number of output samples written (≤ out_capacity).
long ste_resample(const float* in, long n_in, int sr_in, int sr_out,
                  float* out, long out_capacity) {
  if (sr_in <= 0 || sr_out <= 0 || n_in <= 0) return 0;
  if (sr_in == sr_out) {
    long n = std::min(n_in, out_capacity);
    std::memcpy(out, in, n * sizeof(float));
    return n;
  }
  const double ratio = double(sr_in) / double(sr_out);
  const long n_out = std::min<long>(long(n_in / ratio), out_capacity);
  const int taps = 16;
  // low-pass at the lower Nyquist
  const double cutoff = std::min(1.0, 1.0 / ratio);
  for (long j = 0; j < n_out; ++j) {
    const double center = j * ratio;
    const long i0 = long(std::floor(center)) - taps + 1;
    const long i1 = long(std::floor(center)) + taps;
    double acc = 0.0, wsum = 0.0;
    for (long i = std::max<long>(i0, 0); i <= std::min<long>(i1, n_in - 1); ++i) {
      const double x = (i - center) * cutoff;
      double s = (std::abs(x) < 1e-9) ? 1.0 : std::sin(kPi * x) / (kPi * x);
      const double w = 0.5 + 0.5 * std::cos(kPi * (i - center) / taps);
      s *= w * cutoff;
      acc += in[i] * s;
      wsum += s;
    }
    out[j] = static_cast<float>(acc);
    (void)wsum;
  }
  return n_out;
}

// Parallel peak-normalise (only when |x|>1) + zero-pad a batch of clips into a
// [n, bucket] row-major buffer; writes per-row valid sample counts.
void ste_pad_batch(const float* const* clips, const long* lengths, long n,
                   long bucket, float* out_wave, int* out_num_samples,
                   int num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  num_threads = static_cast<int>(std::min<long>(num_threads, std::max<long>(n, 1)));

  auto work = [&](long lo, long hi) {
    for (long i = lo; i < hi; ++i) {
      const long len = std::min(lengths[i], bucket);
      float* row = out_wave + i * bucket;
      float peak = 0.0f;
      for (long t = 0; t < len; ++t) peak = std::max(peak, std::abs(clips[i][t]));
      const float scale = peak > 1.0f ? 1.0f / peak : 1.0f;
      for (long t = 0; t < len; ++t) row[t] = clips[i][t] * scale;
      std::memset(row + len, 0, (bucket - len) * sizeof(float));
      out_num_samples[i] = static_cast<int>(len);
    }
  };

  std::vector<std::thread> pool;
  const long per = (n + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    const long lo = t * per, hi = std::min<long>(n, lo + per);
    if (lo >= hi) break;
    pool.emplace_back(work, lo, hi);
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
