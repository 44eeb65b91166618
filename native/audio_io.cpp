// Native audio IO for the data pipeline: WAV decode + windowed-sinc resampling.
//
// Plays the role torchaudio's libsox/ffmpeg C++ backends play for the reference
// (reference: whisper_medusa/dataset/dataset.py:67-69, eval_whisper_medusa.py:41-45
// use torchaudio.load + torchaudio.functional.resample).  Compiled to a shared
// library and bound via ctypes (whisper_medusa_tpu/data/native.py); the Python
// stdlib/scipy path remains as fallback.
//
// Exports (C ABI):
//   wm_decode_wav(buf, len, out, out_cap, &sr)           -> n_samples or -errcode
//   wm_resample(in, n, sr_in, sr_out, out, out_cap)      -> n_out or -errcode
//   wm_load_resample(buf, len, target_sr, out, out_cap)  -> n_out or -errcode

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kErrBadFile = -1;
constexpr int kErrUnsupported = -2;
constexpr int kErrTooLarge = -3;

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t off = 0;
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
    if (off + 4 > n) { ok = false; return false; }
    bool m = std::memcmp(p + off, t, 4) == 0;
    off += 4;
    return m;
  }
};

// Kaiser-windowed-sinc polyphase resampler (quality comparable to
// torchaudio's default sinc_interp_hann; zeros = 16 lobes).
void sinc_resample(const float* in, int64_t n, int sr_in, int sr_out,
                   std::vector<float>& out) {
  const int64_t g = [](int64_t a, int64_t b) {
    while (b) { int64_t t = a % b; a = b; b = t; }
    return a;
  }(sr_in, sr_out);
  const int64_t up = sr_out / g, down = sr_in / g;
  const int kZeros = 16;
  const double cutoff = 0.99 * 0.5 * std::min(1.0, double(up) / double(down));
  const int64_t n_out = (n * up) / down;
  out.resize(n_out);
  const double support = kZeros / (2.0 * cutoff);

  for (int64_t j = 0; j < n_out; ++j) {
    // Output sample j sits at input-time t = j * down / up.
    const double t = double(j) * double(down) / double(up);
    const int64_t lo = (int64_t)std::ceil(t - support);
    const int64_t hi = (int64_t)std::floor(t + support);
    double acc = 0.0, wsum = 0.0;
    for (int64_t i = lo; i <= hi; ++i) {
      const double x = (t - double(i)) * 2.0 * cutoff;  // sinc argument
      double w = 1.0;
      // Hann window over the support.
      const double u = (double(i) - t) / support;
      if (u < -1.0 || u > 1.0) continue;
      w = 0.5 * (1.0 + std::cos(M_PI * u));
      const double s = (x == 0.0) ? 1.0 : std::sin(M_PI * x) / (M_PI * x);
      const double coef = w * s * 2.0 * cutoff;
      wsum += 0;  // normalization folded into coef (sinc kernel is unit-gain)
      if (i >= 0 && i < n) acc += coef * in[i];
    }
    (void)wsum;
    out[j] = (float)acc;
  }
}

}  // namespace

extern "C" {

int64_t wm_decode_wav(const uint8_t* buf, int64_t len, float* out,
                      int64_t out_cap, int32_t* sr_out) {
  Reader r{buf, (size_t)len};
  if (!r.tag("RIFF")) return kErrBadFile;
  r.u32();  // riff size
  if (!r.tag("WAVE")) return kErrBadFile;

  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  const uint8_t* data = nullptr;
  uint32_t data_len = 0;

  while (r.ok && r.off + 8 <= r.n) {
    char id[4];
    std::memcpy(id, r.p + r.off, 4);
    r.off += 4;
    uint32_t sz = r.u32();
    if (!r.ok) break;
    if (std::memcmp(id, "fmt ", 4) == 0) {
      size_t start = r.off;
      fmt = r.u16();
      channels = r.u16();
      sr = r.u32();
      r.u32();  // byte rate
      r.u16();  // block align
      bits = r.u16();
      r.off = start + sz + (sz & 1);
    } else if (std::memcmp(id, "data", 4) == 0) {
      if (r.off + sz > r.n) sz = (uint32_t)(r.n - r.off);
      data = r.p + r.off;
      data_len = sz;
      r.off += sz + (sz & 1);
    } else {
      r.off += sz + (sz & 1);
    }
  }
  if (!data || channels == 0 || sr == 0) return kErrBadFile;
  const bool pcm = (fmt == 1), flt = (fmt == 3);
  if (!pcm && !flt) return kErrUnsupported;

  int64_t frames;
  if (pcm && bits == 16) frames = data_len / (2 * channels);
  else if (pcm && bits == 32) frames = data_len / (4 * channels);
  else if (pcm && bits == 8) frames = data_len / channels;
  else if (flt && bits == 32) frames = data_len / (4 * channels);
  else return kErrUnsupported;
  if (frames > out_cap) return kErrTooLarge;

  for (int64_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const int64_t k = i * channels + c;
      double v;
      if (pcm && bits == 16) {
        int16_t s;
        std::memcpy(&s, data + 2 * k, 2);
        v = s / 32768.0;
      } else if (pcm && bits == 32) {
        int32_t s;
        std::memcpy(&s, data + 4 * k, 4);
        v = s / 2147483648.0;
      } else if (pcm && bits == 8) {
        v = (data[k] - 128.0) / 128.0;
      } else {
        float f;
        std::memcpy(&f, data + 4 * k, 4);
        v = f;
      }
      acc += v;
    }
    out[i] = (float)(acc / channels);
  }
  *sr_out = (int32_t)sr;
  return frames;
}

int64_t wm_resample(const float* in, int64_t n, int32_t sr_in, int32_t sr_out,
                    float* out, int64_t out_cap) {
  if (sr_in == sr_out) {
    if (n > out_cap) return kErrTooLarge;
    std::memcpy(out, in, n * sizeof(float));
    return n;
  }
  std::vector<float> tmp;
  sinc_resample(in, n, sr_in, sr_out, tmp);
  if ((int64_t)tmp.size() > out_cap) return kErrTooLarge;
  std::memcpy(out, tmp.data(), tmp.size() * sizeof(float));
  return (int64_t)tmp.size();
}

int64_t wm_load_resample(const uint8_t* buf, int64_t len, int32_t target_sr,
                         float* out, int64_t out_cap) {
  std::vector<float> decoded(out_cap > 0 ? (size_t)out_cap : 1);
  int32_t sr = 0;
  int64_t n = wm_decode_wav(buf, len, decoded.data(), out_cap, &sr);
  if (n < 0) return n;
  return wm_resample(decoded.data(), n, sr, target_sr, out, out_cap);
}

}  // extern "C"
