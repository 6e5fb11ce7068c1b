// Native audio runtime kernels for qwen3_tts_tpu.
//
// Host-side hot paths that the reference implements in native Rust
// (rubato sinc resampling, hound WAV I/O, the PCG sampling RNG) are
// provided here as a small C++ library bound via ctypes. Each function
// has a numpy fallback in qwen3_tts_tpu; the semantics are identical.
//
// Build: make -C native  (g++ -O3 -march=native -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Windowed-sinc polyphase resampler.
//
// Matches qwen3_tts_tpu/audio/resample.py exactly: Blackman-Harris window,
// cutoff 0.95 * min(1, up/down), taps over [-half, half], output sample m at
// input position m * down / up. Computation in double, output float32.
// ---------------------------------------------------------------------------

static double blackman_harris(double i, double n) {
  const double x = 2.0 * M_PI * i / (n - 1.0);
  return 0.35875 - 0.48829 * std::cos(x) + 0.14128 * std::cos(2 * x) -
         0.01168 * std::cos(3 * x);
}

static double sinc(double x) {
  if (x == 0.0) return 1.0;
  const double px = M_PI * x;
  return std::sin(px) / px;
}

static int64_t gcd64(int64_t a, int64_t b) {
  while (b) {
    int64_t t = a % b;
    a = b;
    b = t;
  }
  return a;
}

// Returns the number of output samples written (round(n_in * dst / src)).
int64_t resample_sinc(const float* in, int64_t n_in, int64_t src_rate,
                      int64_t dst_rate, int64_t sinc_len, float* out) {
  if (n_in <= 0) return 0;
  const int64_t n_out =
      (int64_t)std::llround((double)n_in * (double)dst_rate / (double)src_rate);
  if (n_out <= 0) return 0;

  const int64_t g = gcd64(src_rate, dst_rate);
  const int64_t up = dst_rate / g, down = src_rate / g;
  const double cutoff = 0.95 * std::min(1.0, (double)up / (double)down);
  const int64_t half = sinc_len / 2;
  const int64_t taps = 2 * half + 1;

  // Polyphase kernel: kernel[p][j] = cutoff * sinc(cutoff*(t_j - p/up)) * w_j
  std::vector<double> kernel((size_t)up * taps);
  for (int64_t p = 0; p < up; ++p) {
    const double phase = (double)p / (double)up;
    for (int64_t j = 0; j < taps; ++j) {
      const double t = (double)(j - half) - phase;
      kernel[(size_t)p * taps + j] =
          cutoff * sinc(cutoff * t) * blackman_harris((double)j, (double)taps);
    }
  }

  // Zero-padded input: [half zeros] in [half+1 zeros]
  std::vector<double> padded((size_t)(n_in + taps));
  for (int64_t i = 0; i < n_in; ++i) padded[(size_t)(i + half)] = in[i];

  for (int64_t m = 0; m < n_out; ++m) {
    const int64_t pos_num = m * down;
    const int64_t q = pos_num / up;
    const int64_t p = pos_num - q * up;
    const double* k = &kernel[(size_t)p * taps];
    const double* x = &padded[(size_t)q];
    double acc = 0.0;
    for (int64_t j = 0; j < taps; ++j) acc += x[j] * k[j];
    out[m] = (float)acc;
  }
  return n_out;
}

// ---------------------------------------------------------------------------
// PCM16 WAV write (mono). Returns 0 on success.
// ---------------------------------------------------------------------------

int wav_write_pcm16(const char* path, const float* samples, int64_t n,
                    int32_t sample_rate) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;

  const uint32_t data_bytes = (uint32_t)(n * 2);
  const uint32_t riff_size = 36 + data_bytes;
  const uint16_t channels = 1, bits = 16, fmt = 1;
  const uint32_t byte_rate = (uint32_t)sample_rate * channels * bits / 8;
  const uint16_t block_align = channels * bits / 8;

  std::fwrite("RIFF", 1, 4, f);
  std::fwrite(&riff_size, 4, 1, f);
  std::fwrite("WAVEfmt ", 1, 8, f);
  const uint32_t fmt_size = 16;
  std::fwrite(&fmt_size, 4, 1, f);
  std::fwrite(&fmt, 2, 1, f);
  std::fwrite(&channels, 2, 1, f);
  std::fwrite(&sample_rate, 4, 1, f);
  std::fwrite(&byte_rate, 4, 1, f);
  std::fwrite(&block_align, 2, 1, f);
  std::fwrite(&bits, 2, 1, f);
  std::fwrite("data", 1, 4, f);
  std::fwrite(&data_bytes, 4, 1, f);

  constexpr int64_t CHUNK = 1 << 16;
  std::vector<int16_t> buf(CHUNK);
  for (int64_t off = 0; off < n; off += CHUNK) {
    const int64_t len = std::min(CHUNK, n - off);
    for (int64_t i = 0; i < len; ++i) {
      float v = samples[off + i];
      v = v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
      buf[i] = (int16_t)(v * 32767.0f);
    }
    std::fwrite(buf.data(), 2, (size_t)len, f);
  }
  std::fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// PCG-XSH-RR 64/32 uniform stream (bit-exact with ops/rng.py).
// ---------------------------------------------------------------------------

void pcg_uniforms(uint64_t seed, int64_t n, float* out) {
  uint64_t state = seed * 2685821657736338717ULL + 1442695040888963407ULL;
  for (int64_t i = 0; i < n; ++i) {
    const uint64_t old = state;
    state = old * 6364136223846793005ULL + 1442695040888963407ULL;
    const uint32_t xorshifted = (uint32_t)(((old >> 18) ^ old) >> 27);
    const uint32_t rot = (uint32_t)(old >> 59) & 31u;
    const uint32_t word =
        rot ? ((xorshifted >> rot) | (xorshifted << (32 - rot))) : xorshifted;
    out[i] = (float)word / (float)UINT32_MAX;
  }
}

}  // extern "C"
