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
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

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
//
// Implemented as a POLYPHASE decomposition: output m uses only filter phase
// p = (m+skip)*down mod up, whose taps h[p], h[p+up], ... are gathered once
// into a contiguous row stored REVERSED, so the per-sample kernel is a
// unit-stride dot product of the phase row against x — the original
// stride-`up` walk through h defeated vectorization (measured 5.9 ms for a
// 10 s 22050->16000 clip; this form + 8 independent accumulators lets g++
// -O3 -march=native emit vector FMAs while keeping a deterministic
// float32 summation order independent of the host's vector width).
// ---------------------------------------------------------------------------

int gdl_upfirdn(const float* x, int32_t n_in, const float* h, int32_t n_taps,
                int32_t up, int32_t down, int32_t skip, float* out,
                int32_t n_out) {
  const int32_t L = (n_taps + up - 1) / up;   // max taps per phase
  const int32_t L16 = ((L + 15) / 16) * 16;   // row stride, zero-padded so
  // the steady-state dot has a FIXED trip count (no remainder loop): the
  // pad taps are 0 and multiply x samples newer than t, contributing 0.
  std::vector<float> hp((size_t)up * L16, 0.0f);
  std::vector<int32_t> plen((size_t)up);
  for (int32_t p = 0; p < up; ++p) {
    const int32_t lp = (n_taps - p + up - 1) / up;
    plen[p] = lp;
    float* row = &hp[(size_t)p * L16];
    for (int32_t j = 0; j < lp; ++j)
      row[lp - 1 - j] = h[p + (int64_t)j * up];  // reversed phase row
  }
  // i = (m+skip)*down = t*up + p, advanced incrementally (no div/mod per m)
  int64_t i0 = (int64_t)skip * down;
  int32_t p = (int32_t)(i0 % up);
  int64_t t = i0 / up;  // newest contributing x index
  const int32_t dp = down % up;
  const int64_t dt = down / up;
  for (int32_t m = 0; m < n_out; ++m) {
    const int32_t lp = plen[p];
    // y[m] = sum_q hp_rev[p][q] * x[t - lp + 1 + q], q clipped to valid x
    const int64_t k0f = t - lp + 1;
    const float* row = &hp[(size_t)p * L16];
    float acc;
    if (k0f >= 0 && k0f + L16 <= n_in) {
      // steady state: fixed-count vector dot over the zero-padded row
      const float* xs = &x[k0f];
      float a[16] = {0};
      for (int32_t q = 0; q < L16; q += 16)
        for (int32_t u = 0; u < 16; ++u) a[u] += row[q + u] * xs[q + u];
      float s0 = ((a[0] + a[1]) + (a[2] + a[3])) +
                 ((a[4] + a[5]) + (a[6] + a[7]));
      float s1 = ((a[8] + a[9]) + (a[10] + a[11])) +
                 ((a[12] + a[13]) + (a[14] + a[15]));
      acc = s0 + s1;
    } else {
      // edges: clip the x range (pad taps beyond lp stay excluded)
      int64_t k0 = k0f;
      int32_t q0 = 0;
      if (k0 < 0) {
        q0 = (int32_t)(-k0);
        k0 = 0;
      }
      const int64_t k1 = t < (int64_t)n_in - 1 ? t : (int64_t)n_in - 1;
      const int64_t cnt = k1 - k0 + 1;
      const float* hr = row + q0;
      const float* xs = &x[k0];
      acc = 0.0f;
      for (int64_t q = 0; q < cnt; ++q) acc += hr[q] * xs[q];
    }
    out[m] = acc;
    t += dt;
    p += dp;
    if (p >= up) {
      p -= up;
      t += 1;
    }
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
  // segment-wise: one div to find the phase of the first sample, then
  // contiguous clip-copies (vectorizable min/max) — the old per-sample
  // `idx % n_src` cost a hardware divide per output sample
  int32_t j = 0;
  int64_t idx = (int64_t)start;
  int64_t off = idx < tiled_len ? idx % n_src : 0;
  while (j < target_len && idx < tiled_len) {
    int64_t chunk = (int64_t)n_src - off;
    if (chunk > (int64_t)target_len - j) chunk = (int64_t)target_len - j;
    if (chunk > tiled_len - idx) chunk = tiled_len - idx;
    const float* s = src + off;
    for (int64_t u = 0; u < chunk; ++u) {
      float v = s[u];
      out[j + u] = v > 1.0f ? 1.0f : (v < -1.0f ? -1.0f : v);
    }
    j += (int32_t)chunk;
    idx += chunk;
    off = 0;  // subsequent segments restart at the tile boundary
  }
  for (; j < target_len; ++j) out[j] = 0.0f;  // pad past tiles
  return 0;
}

// ---------------------------------------------------------------------------
// Batched collate over the offline-preprocessed cache
// (tools/preprocess_dataset.py). The Python side owns every RNG draw
// (crop starts, frame selections — byte-identical to the per-sample path)
// and the one-time .npy header parse; this call is the pure-IO tail for a
// WHOLE batch: pread the cached f32 waveform, apply the tile/crop/clip
// tail (same segment-copy form as gdl_wav_to_fixed), and pread the
// selected uint8 frame rows straight into the final batch buffers — no
// per-sample numpy arrays, no np.load header re-parse per epoch (the
// profiled cached path spent ~60% of its 0.7 ms/clip in np.load open +
// ast-eval header parsing alone).
//
// Per-sample inputs (arrays of length `batch`):
//   apaths/aoff/alen   audio .npy: path, payload byte offset, n samples
//   tiled_len          virtual post-tile length (3*L for CREMAD/AVE;
//                      L doubled to >= 10 s for the crop datasets —
//                      computed in Python to mirror _fixed_from_wave)
//   starts             crop start (Python-drawn; 0 where the dataset
//                      never crops)
//   fpaths/foff        frames .npy: path, payload byte offset
//   rows [batch*n_frames]  selected frame row indices (repeats allowed —
//                      the short-clip repeat-last-frame padding arrives
//                      already resolved)
// Outputs: wave_out [batch, target] f32, frames_out
// [batch, n_frames*row_bytes] u8. Returns 0, or -(b+1) for the first
// sample whose file IO failed (caller falls back to the Python path).
// ---------------------------------------------------------------------------

static int collate_one(const char* apath, int64_t aoff, int64_t alen,
                       int64_t tiled_len, int64_t start, int32_t target,
                       float* wave_out, const char* fpath, int64_t foff,
                       const int32_t* rows, int32_t n_frames,
                       int64_t row_bytes, uint8_t* frames_out) {
  {
    int fd = open(apath, O_RDONLY);
    if (fd < 0) return -1;
    // samples emitted before the zero pad: min(target, tiled_len - start)
    int64_t ncopy = tiled_len - start;
    if (ncopy > target) ncopy = target;
    if (ncopy < 0) ncopy = 0;
    if (start + ncopy <= alen) {
      // no-wrap fast path (every KS/VGG/kinect400 crop of a >=10 s cached
      // wave, and CREMAD clips >= 3 s): the window is contiguous in the
      // source — pread it STRAIGHT into the batch buffer and clip in
      // place, skipping the whole-wave temp copy (halves the audio read
      // traffic for 10 s KS caches)
      int64_t want = ncopy * 4;
      if (pread(fd, wave_out, (size_t)want, (off_t)(aoff + start * 4))
          != want) {
        close(fd);
        return -1;
      }
      close(fd);
      for (int64_t u = 0; u < ncopy; ++u) {
        float v = wave_out[u];
        wave_out[u] = v > 1.0f ? 1.0f : (v < -1.0f ? -1.0f : v);
      }
      for (int64_t j = ncopy; j < target; ++j) wave_out[j] = 0.0f;
    } else {
      // wrap: the tiled window re-reads the source — load the whole wave
      std::vector<float> wave((size_t)alen);
      int64_t want = alen * 4;
      if (pread(fd, wave.data(), (size_t)want, (off_t)aoff) != want) {
        close(fd);
        return -1;
      }
      close(fd);
      // tile/crop/clip tail (== _fixed_from_wave numerics): out[i] =
      // clip(wave[(start+i) % alen]) while start+i < tiled_len, 0 after
      int32_t j = 0;
      int64_t idx = start;
      int64_t off = (alen > 0 && idx < tiled_len) ? idx % alen : 0;
      while (j < target && idx < tiled_len && alen > 0) {
        int64_t chunk = alen - off;
        if (chunk > (int64_t)target - j) chunk = (int64_t)target - j;
        if (chunk > tiled_len - idx) chunk = tiled_len - idx;
        const float* s = wave.data() + off;
        for (int64_t u = 0; u < chunk; ++u) {
          float v = s[u];
          wave_out[j + u] = v > 1.0f ? 1.0f : (v < -1.0f ? -1.0f : v);
        }
        j += (int32_t)chunk;
        idx += chunk;
        off = 0;
      }
      for (; j < target; ++j) wave_out[j] = 0.0f;
    }
  }
  {
    int fd = open(fpath, O_RDONLY);
    if (fd < 0) return -1;
    for (int32_t k = 0; k < n_frames; ++k) {
      uint8_t* dst = frames_out + (size_t)k * row_bytes;
      off_t src = (off_t)(foff + (int64_t)rows[k] * row_bytes);
      if (pread(fd, dst, (size_t)row_bytes, src) != (ssize_t)row_bytes) {
        close(fd);
        return -1;
      }
    }
    close(fd);
  }
  return 0;
}

int gdl_collate_cached(const char** apaths, const int64_t* aoff,
                       const int64_t* alen, const int64_t* tiled_len,
                       const int64_t* starts, int32_t target,
                       float* wave_out, const char** fpaths,
                       const int64_t* foff, const int32_t* rows,
                       int32_t n_frames, int64_t row_bytes,
                       uint8_t* frames_out, int32_t batch,
                       int32_t nthreads) {
  std::vector<int> rc((size_t)batch, 0);
  auto run = [&](int32_t b0, int32_t b1) {
    for (int32_t b = b0; b < b1; ++b)
      rc[b] = collate_one(apaths[b], aoff[b], alen[b], tiled_len[b],
                          starts[b], target, wave_out + (size_t)b * target,
                          fpaths[b], foff[b], rows + (size_t)b * n_frames,
                          n_frames, row_bytes,
                          frames_out + (size_t)b * n_frames * row_bytes);
  };
  if (nthreads <= 1 || batch <= 1) {
    run(0, batch);
  } else {
    int32_t nt = nthreads < batch ? nthreads : batch;
    std::vector<std::thread> ts;
    int32_t per = (batch + nt - 1) / nt;
    for (int32_t t = 0; t < nt; ++t) {
      int32_t b0 = t * per, b1 = b0 + per < batch ? b0 + per : batch;
      if (b0 >= b1) break;
      ts.emplace_back(run, b0, b1);
    }
    for (auto& t : ts) t.join();
  }
  for (int32_t b = 0; b < batch; ++b)
    if (rc[b] != 0) return -(b + 1);
  return 0;
}

}  // extern "C"
