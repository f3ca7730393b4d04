// gdl_host — native host-side data-pipeline kernels.
//
// The reference's input pipeline burns host CPU in 32 worker processes on
// librosa decode/resample per sample (SURVEY §3.5, its dominant cost). Our
// device does the STFT; what remains on the host — WAV decode, mono mix,
// polyphase FIR resample — is implemented here in C++ and bound via ctypes
// (no pybind11 in this image). Every call releases the GIL (ctypes), so a
// Python thread pool scales these across cores.
//
// The resampler mirrors scipy.signal.resample_poly's upfirdn slicing:
// Python supplies the (firwin * up, zero-padded) taps plus the skip/len
// bookkeeping; this file runs the O(n_out * n_taps / up) inner loop.
//
// Build: make -C native   (→ native/libgdlhost.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// WAV (RIFF) decode: PCM 8/16/24/32 and float32/float64, any channel count
// (averaged to mono). Returns 0 on success.
// ---------------------------------------------------------------------------

struct WavInfo {
  int32_t n_samples;  // per-channel
  int32_t rate;
  int32_t channels;
  int32_t bits;
  int32_t fmt;       // 1 = PCM, 3 = IEEE float
  int64_t data_off;  // byte offset of the data chunk payload
  int64_t data_len;
};

static int parse_header(FILE* f, WavInfo* info) {
  uint8_t hdr[12];
  if (fread(hdr, 1, 12, f) != 12) return -1;
  if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0)
    return -2;
  bool have_fmt = false, have_data = false;
  int64_t pos = 12;
  while (!(have_fmt && have_data)) {
    uint8_t chunk[8];
    if (fseek(f, (long)pos, SEEK_SET) != 0) return -3;
    if (fread(chunk, 1, 8, f) != 8) break;
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (memcmp(chunk, "fmt ", 4) == 0) {
      uint8_t body[40];
      size_t want = size < 40 ? size : 40;
      if (fread(body, 1, want, f) != want) return -4;
      uint16_t fmt16, ch, bits;
      uint32_t rate;
      memcpy(&fmt16, body, 2);
      memcpy(&ch, body + 2, 2);
      memcpy(&rate, body + 4, 4);
      memcpy(&bits, body + 14, 2);
      if (fmt16 == 0xFFFE && size >= 40) memcpy(&fmt16, body + 24, 2);
      info->fmt = fmt16;
      info->channels = ch;
      info->rate = (int32_t)rate;
      info->bits = bits;
      have_fmt = true;
    } else if (memcmp(chunk, "data", 4) == 0) {
      info->data_off = pos + 8;
      info->data_len = size;
      have_data = true;
    }
    pos += 8 + size + (size & 1);
  }
  if (!have_fmt || !have_data) return -5;
  int bytes_per = info->bits / 8;
  info->n_samples =
      (int32_t)(info->data_len / (bytes_per * (int64_t)info->channels));
  return 0;
}

int gdl_wav_info(const char* path, int32_t* n_samples, int32_t* rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info{};
  int rc = parse_header(f, &info);
  fclose(f);
  if (rc != 0) return rc;
  *n_samples = info.n_samples;
  *rate = info.rate;
  return 0;
}

int gdl_wav_read(const char* path, float* out, int32_t max_samples) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info{};
  int rc = parse_header(f, &info);
  if (rc != 0) {
    fclose(f);
    return rc;
  }
  int n = info.n_samples < max_samples ? info.n_samples : max_samples;
  int ch = info.channels;
  int bytes_per = info.bits / 8;
  std::vector<uint8_t> raw((size_t)n * ch * bytes_per);
  fseek(f, (long)info.data_off, SEEK_SET);
  size_t got = fread(raw.data(), 1, raw.size(), f);
  fclose(f);
  size_t frames = got / (bytes_per * ch);

  const float inv_ch = 1.0f / (float)ch;
  for (size_t i = 0; i < frames; ++i) {
    float acc = 0.0f;
    for (int c = 0; c < ch; ++c) {
      const uint8_t* p = raw.data() + (i * ch + c) * bytes_per;
      float v = 0.0f;
      if (info.fmt == 3) {
        if (info.bits == 32) {
          float fv;
          memcpy(&fv, p, 4);
          v = fv;
        } else {
          double dv;
          memcpy(&dv, p, 8);
          v = (float)dv;
        }
      } else if (info.bits == 16) {
        int16_t s;
        memcpy(&s, p, 2);
        v = (float)s / 32768.0f;
      } else if (info.bits == 8) {
        v = ((float)p[0] - 128.0f) / 128.0f;
      } else if (info.bits == 24) {
        int32_t s = (int32_t)p[0] | ((int32_t)p[1] << 8) |
                    ((int32_t)p[2] << 16);
        if (s >= (1 << 23)) s -= (1 << 24);
        v = (float)s / (float)(1 << 23);
      } else if (info.bits == 32) {
        int32_t s;
        memcpy(&s, p, 4);
        v = (float)s / 2147483648.0f;
      }
      acc += v;
    }
    out[i] = acc * inv_ch;
  }
  return (int)frames;
}

// ---------------------------------------------------------------------------
// upfirdn inner loop (scipy-compatible slicing done by the Python caller):
//   y[m] = sum_k h[m*down - k*up] * x[k]
// evaluated for m in [skip, skip + n_out).
// ---------------------------------------------------------------------------

int gdl_upfirdn(const float* x, int32_t n_in, const float* h, int32_t n_taps,
                int32_t up, int32_t down, int32_t skip, float* out,
                int32_t n_out) {
  for (int32_t m = 0; m < n_out; ++m) {
    const int64_t i = (int64_t)(m + skip) * down;  // index into conv output
    // valid k: 0 <= k < n_in and 0 <= i - k*up < n_taps
    int64_t k_min = (i - n_taps + up) / up;  // ceil((i - n_taps + 1) / up)
    if ((i - n_taps + 1) > k_min * up) ++k_min;
    if (k_min < 0) k_min = 0;
    int64_t k_max = i / up;
    if (k_max >= n_in) k_max = n_in - 1;
    float acc = 0.0f;
    for (int64_t k = k_min; k <= k_max; ++k) {
      acc += h[i - k * up] * x[k];
    }
    out[m] = acc;
  }
  return 0;
}

// Fused convenience: decode + resample + tile + crop + clip to a fixed
// length — one call per sample from the loader's thread pool.
int gdl_wav_to_fixed(const char* path, const float* h, int32_t n_taps,
                     int32_t up, int32_t down, int32_t skip,
                     int32_t resampled_len, int32_t tile, int32_t start,
                     int32_t target_len, float* out) {
  int32_t n_raw, rate;
  if (gdl_wav_info(path, &n_raw, &rate) != 0) return -1;
  std::vector<float> raw((size_t)n_raw);
  int frames = gdl_wav_read(path, raw.data(), n_raw);
  if (frames < 0) return frames;

  std::vector<float> res;
  const float* src;
  int32_t n_src;
  if (up == 1 && down == 1) {
    src = raw.data();
    n_src = frames;
  } else {
    res.resize((size_t)resampled_len);
    gdl_upfirdn(raw.data(), frames, h, n_taps, up, down, skip, res.data(),
                resampled_len);
    src = res.data();
    n_src = resampled_len;
  }
  if (n_src <= 0) return -2;
  const int64_t tiled_len = (int64_t)n_src * tile;
  for (int32_t j = 0; j < target_len; ++j) {
    const int64_t idx = (int64_t)start + j;
    float v = idx < tiled_len ? src[idx % n_src] : 0.0f;  // pad past tiles
    out[j] = v > 1.0f ? 1.0f : (v < -1.0f ? -1.0f : v);
  }
  return 0;
}

}  // extern "C"
