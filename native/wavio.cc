// Native data-ingest hot path: threaded WAV decode + resample + batch fill.
//
// The framework's runtime around the XLA compute path is native where it is
// hot: audio ingest decodes thousands of small WAV files per epoch
// (Flickr8k: 30k wavs), which in Python costs an interpreter round-trip per
// file. This library decodes a whole batch with a std::thread pool and
// writes straight into the caller's pinned float32 buffer (the bucketed
// batch), one memcpy away from the device transfer.
//
// C ABI (ctypes-friendly):
//   wavio_decode_batch(paths, n, target_sr, max_len, offsets, out,
//                      out_lens, threads)
//     paths     : array of n NUL-terminated UTF-8 paths
//     offsets   : per-file start offset in target-sr samples (train-time
//                 random crop), or NULL
//     out       : float32 buffer (n, max_len), zero-padded
//     out_lens  : int32 buffer (n,) decoded (possibly resampled) lengths
//     returns 0 on success, else the 1-based index of the first failed file
//
// Scope: 8/16/32-bit PCM mono/stereo WAVs (the corpora are 16 kHz 16-bit
// mono); other rates are linearly resampled. Exotic formats fall back to
// the Python reader.
//
// Build: native/build.sh (g++ -O3 -shared -fPIC).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WavData {
  std::vector<float> samples;  // mono
  int sample_rate = 0;
};

bool read_wav(const char* path, WavData* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  char riff[4], wave[4];
  uint32_t riff_size;
  if (std::fread(riff, 1, 4, f) != 4 || std::memcmp(riff, "RIFF", 4) != 0 ||
      std::fread(&riff_size, 4, 1, f) != 1 ||
      std::fread(wave, 1, 4, f) != 4 || std::memcmp(wave, "WAVE", 4) != 0) {
    std::fclose(f);
    return false;
  }
  uint16_t audio_format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  std::vector<uint8_t> data;
  // chunk walk
  for (;;) {
    char id[4];
    uint32_t size;
    if (std::fread(id, 1, 4, f) != 4 || std::fread(&size, 4, 1, f) != 1) break;
    if (std::memcmp(id, "fmt ", 4) == 0) {
      // a PCM fmt chunk is >= 16 bytes (we index fmt[0..15]); a corrupt
      // smaller size would read past the heap buffer, a corrupt huge one
      // would throw bad_alloc inside a worker thread (-> std::terminate)
      if (size < 16 || size > (1u << 20)) {
        std::fclose(f);
        return false;
      }
      std::vector<uint8_t> fmt(size);
      if (std::fread(fmt.data(), 1, size, f) != size) break;
      audio_format = fmt[0] | (fmt[1] << 8);
      channels = fmt[2] | (fmt[3] << 8);
      sample_rate = fmt[4] | (fmt[5] << 8) | (fmt[6] << 16) |
                    (uint32_t(fmt[7]) << 24);
      bits = fmt[14] | (fmt[15] << 8);
    } else if (std::memcmp(id, "data", 4) == 0) {
      if (size > (1u << 30)) {  // >1 GiB "data" in a speech corpus: corrupt
        std::fclose(f);
        return false;
      }
      data.resize(size);
      if (std::fread(data.data(), 1, size, f) != size) {
        std::fclose(f);
        return false;
      }
      break;
    } else {
      std::fseek(f, (size + 1) & ~1u, SEEK_CUR);  // chunks are word-aligned
    }
  }
  std::fclose(f);
  // bits gate BEFORE the bits/8 division: a malformed bits value in 0..7
  // would otherwise divide by zero (SIGFPE kills the whole process from a
  // worker thread — the contract is "return the failed index, caller falls
  // back to the Python reader")
  if (audio_format != 1 /*PCM*/ || channels == 0 || sample_rate == 0 ||
      data.empty() || (bits != 8 && bits != 16 && bits != 32))
    return false;

  const size_t bytes_per = bits / 8;
  const size_t n_frames = data.size() / (bytes_per * channels);
  out->sample_rate = int(sample_rate);
  out->samples.resize(n_frames);
  const uint8_t* p = data.data();
  for (size_t i = 0; i < n_frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* s = p + (i * channels + c) * bytes_per;
      double v;
      if (bits == 16) {
        int16_t x;
        std::memcpy(&x, s, 2);
        v = x / 32768.0;
      } else if (bits == 32) {
        int32_t x;
        std::memcpy(&x, s, 4);
        v = x / 2147483648.0;
      } else if (bits == 8) {
        v = (int(s[0]) - 128) / 128.0;
      } else {
        return false;
      }
      acc += v;
    }
    out->samples[i] = float(acc / channels);
  }
  return true;
}

// linear resample (corpora are already 16 kHz; this is the rare path)
void resample_linear(const std::vector<float>& in, int in_sr, int out_sr,
                     std::vector<float>* out) {
  const size_t n_out =
      size_t(double(in.size()) * out_sr / in_sr + 0.5);
  out->resize(n_out);
  const double step = double(in_sr) / out_sr;
  for (size_t i = 0; i < n_out; ++i) {
    double pos = i * step;
    size_t i0 = size_t(pos);
    double frac = pos - i0;
    size_t i1 = i0 + 1 < in.size() ? i0 + 1 : in.size() - 1;
    (*out)[i] = float(in[i0 < in.size() ? i0 : in.size() - 1] * (1.0 - frac) +
                      in[i1] * frac);
  }
}

}  // namespace

extern "C" {

int wavio_decode_batch(const char** paths, int n, int target_sr, long max_len,
                       const long* offsets, float* out, int* out_lens,
                       int threads) {
  std::atomic<int> failed{0};
  std::atomic<int> next{0};
  if (threads <= 0) threads = int(std::thread::hardware_concurrency());
  if (threads <= 0) threads = 1;  // hardware_concurrency() may return 0
  if (threads > n) threads = n > 0 ? n : 1;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      WavData wav;
      if (!read_wav(paths[i], &wav)) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        out_lens[i] = 0;
        continue;
      }
      std::vector<float> resampled;
      const std::vector<float>* src = &wav.samples;
      if (wav.sample_rate != target_sr) {
        resample_linear(wav.samples, wav.sample_rate, target_sr, &resampled);
        src = &resampled;
      }
      long off = offsets ? offsets[i] : 0;
      if (off < 0) off = 0;
      if (off > long(src->size())) off = long(src->size());
      long len = long(src->size()) - off;
      if (len > max_len) len = max_len;
      std::memcpy(out + size_t(i) * max_len, src->data() + off,
                  size_t(len) * sizeof(float));
      if (len < max_len)
        std::memset(out + size_t(i) * max_len + len, 0,
                    size_t(max_len - len) * sizeof(float));
      out_lens[i] = int(len);
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failed.load();
}

int wavio_num_samples(const char* path, int target_sr) {
  // header-only length probe (for bucketing)
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char riff[4], wave[4];
  uint32_t riff_size;
  if (std::fread(riff, 1, 4, f) != 4 || std::fread(&riff_size, 4, 1, f) != 1 ||
      std::fread(wave, 1, 4, f) != 4) {
    std::fclose(f);
    return -1;
  }
  uint16_t channels = 0, bits = 0;
  uint32_t sample_rate = 0, data_size = 0;
  for (;;) {
    char id[4];
    uint32_t size;
    if (std::fread(id, 1, 4, f) != 4 || std::fread(&size, 4, 1, f) != 1) break;
    if (std::memcmp(id, "fmt ", 4) == 0) {
      if (size < 16 || size > (1u << 20)) {  // see read_wav
        std::fclose(f);
        return -1;
      }
      std::vector<uint8_t> fmt(size);
      if (std::fread(fmt.data(), 1, size, f) != size) break;
      channels = fmt[2] | (fmt[3] << 8);
      sample_rate = fmt[4] | (fmt[5] << 8) | (fmt[6] << 16) |
                    (uint32_t(fmt[7]) << 24);
      bits = fmt[14] | (fmt[15] << 8);
    } else if (std::memcmp(id, "data", 4) == 0) {
      data_size = size;
      break;
    } else {
      std::fseek(f, (size + 1) & ~1u, SEEK_CUR);
    }
  }
  std::fclose(f);
  // same bits gate as read_wav: bits in 1..7 would divide by zero below
  if (!channels || !sample_rate ||
      (bits != 8 && bits != 16 && bits != 32))
    return -1;
  long n = long(data_size) / (bits / 8) / channels;
  if (int(sample_rate) == target_sr) return int(n);
  return int(double(n) * target_sr / sample_rate + 0.5);
}

}  // extern "C"
