// Native host audio batch pipeline for SPIRAL pretraining.
//
// Fuses what the Python path does in three passes (AudioDataset.__getitem__
// -> RandomNoisePerturbation -> AudioBatchCollate, tpu_speech/data/spiral.py)
// into ONE parallel pass that writes the final (B, crop) batch matrices:
//   per item: seek-read a cropped window of the wav file, convert to float32,
//   optionally mix a noise segment at a given SNR, write clean + perturbed
//   rows in place. OpenMP parallel over batch items; each ctypes call
//   releases the GIL, so loader worker threads overlap with the train step.
//
// All randomness stays in Python (crop/segment positions arrive as uniforms,
// SNRs as floats) so batches are reproducible from the loader seed alone.
//
// Replaces the host side of the reference's DataLoader workers
// (SPIRAL/nemo/collections/asr/parts/perturb.py:478-582 noise splicing,
// parts/features.py:114-170 crop) for the TPU input pipeline.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct WavInfo {
  std::FILE* f = nullptr;
  long data_offset = 0;
  int64_t n_frames = 0;
  int channels = 1;
  int bits = 16;
  int format = 1;  // 1 = PCM int, 3 = IEEE float
  int sample_rate = 0;
};

bool read_u32(std::FILE* f, uint32_t* v) {
  return std::fread(v, 4, 1, f) == 1;
}
bool read_u16(std::FILE* f, uint16_t* v) {
  return std::fread(v, 2, 1, f) == 1;
}

// Parse RIFF/WAVE headers; leaves the file positioned anywhere. Returns
// false on malformed/unsupported files.
bool open_wav(const char* path, WavInfo* w) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  char tag[4];
  uint32_t sz;
  if (std::fread(tag, 1, 4, f) != 4 || std::memcmp(tag, "RIFF", 4) != 0 ||
      !read_u32(f, &sz) || std::fread(tag, 1, 4, f) != 4 ||
      std::memcmp(tag, "WAVE", 4) != 0) {
    std::fclose(f);
    return false;
  }
  bool have_fmt = false, have_data = false;
  while (!have_data) {
    if (std::fread(tag, 1, 4, f) != 4 || !read_u32(f, &sz)) break;
    if (std::memcmp(tag, "fmt ", 4) == 0) {
      uint16_t fmt, ch, block, bits;
      uint32_t rate, brate;
      if (!read_u16(f, &fmt) || !read_u16(f, &ch) || !read_u32(f, &rate) ||
          !read_u32(f, &brate) || !read_u16(f, &block) || !read_u16(f, &bits))
        break;
      // WAVE_FORMAT_EXTENSIBLE (0xFFFE): true format is in the extension
      if (fmt == 0xFFFE && sz >= 40) {
        uint16_t ext_len, valid_bits;
        uint32_t mask;
        char guid[16];
        if (!read_u16(f, &ext_len) || !read_u16(f, &valid_bits) ||
            !read_u32(f, &mask) || std::fread(guid, 1, 16, f) != 16)
          break;
        fmt = static_cast<uint16_t>(guid[0]) |
              (static_cast<uint16_t>(guid[1]) << 8);
        if (sz > 40) std::fseek(f, static_cast<long>(sz - 40), SEEK_CUR);
      } else if (sz > 16) {
        std::fseek(f, static_cast<long>(sz - 16), SEEK_CUR);
      }
      w->format = fmt;
      w->channels = ch;
      w->bits = bits;
      w->sample_rate = static_cast<int>(rate);
      have_fmt = true;
    } else if (std::memcmp(tag, "data", 4) == 0) {
      w->data_offset = std::ftell(f);
      int bytes = (w->bits / 8) * (w->channels ? w->channels : 1);
      if (bytes <= 0) break;
      w->n_frames = static_cast<int64_t>(sz) / bytes;
      have_data = true;
    } else {
      std::fseek(f, static_cast<long>(sz + (sz & 1)), SEEK_CUR);
    }
  }
  if (!have_fmt || !have_data ||
      !((w->format == 1 && (w->bits == 16 || w->bits == 32 || w->bits == 8)) ||
        (w->format == 3 && w->bits == 32))) {
    std::fclose(f);
    return false;
  }
  w->f = f;
  return true;
}

// Read n frames starting at frame `start` into out[0..n), converting to
// float32 in [-1, 1] and averaging channels (matches data/wav.py::read_wav).
bool read_frames(const WavInfo& w, int64_t start, int64_t n, float* out) {
  const int ch = w.channels;
  const int bps = w.bits / 8;
  const int frame_bytes = ch * bps;
  if (std::fseek(w.f, w.data_offset + static_cast<long>(start * frame_bytes),
                 SEEK_SET) != 0)
    return false;
  std::vector<uint8_t> buf(static_cast<size_t>(n) * frame_bytes);
  if (std::fread(buf.data(), 1, buf.size(), w.f) != buf.size()) return false;
  // mono fast paths: branch-free tight loops the compiler can vectorize
  if (ch == 1 && w.format == 1 && w.bits == 16) {
    const int16_t* s = reinterpret_cast<const int16_t*>(buf.data());
    constexpr float k = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = s[i] * k;
    return true;
  }
  if (ch == 1 && w.format == 3) {
    std::memcpy(out, buf.data(), static_cast<size_t>(n) * 4);
    return true;
  }
  if (ch == 1 && w.format == 1 && w.bits == 32) {
    const int32_t* s = reinterpret_cast<const int32_t*>(buf.data());
    constexpr float k = 1.0f / 2147483648.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = s[i] * k;
    return true;
  }
  const float inv_ch = 1.0f / ch;
  for (int64_t i = 0; i < n; ++i) {
    float acc = 0.0f;
    const uint8_t* p = buf.data() + i * frame_bytes;
    for (int c = 0; c < ch; ++c) {
      const uint8_t* s = p + c * bps;
      if (w.format == 3) {  // float32
        float v;
        std::memcpy(&v, s, 4);
        acc += v;
      } else if (w.bits == 16) {
        int16_t v;
        std::memcpy(&v, s, 2);
        acc += static_cast<float>(v) / 32768.0f;
      } else if (w.bits == 32) {
        int32_t v;
        std::memcpy(&v, s, 4);
        acc += static_cast<float>(v) / 2147483648.0f;
      } else {  // uint8
        acc += (static_cast<float>(*s) - 128.0f) / 128.0f;
      }
    }
    out[i] = acc * inv_ch;
  }
  return true;
}

// Read a length-n segment of the noise signal starting at `start` in the
// TILED noise stream (noise repeated to cover n), i.e. sample j comes from
// frame (start + j) % n_frames. Reads at most ceil coverage of the file.
bool read_noise_segment(const WavInfo& w, int64_t start, int64_t n,
                        float* out) {
  int64_t pos = start % w.n_frames;
  int64_t done = 0;
  while (done < n) {
    int64_t chunk = w.n_frames - pos;
    if (chunk > n - done) chunk = n - done;
    if (!read_frames(w, pos, chunk, out + done)) return false;
    done += chunk;
    pos = 0;
  }
  return true;
}

}  // namespace

extern "C" {

// Probe a wav file: returns 0 and fills (n_frames, sample_rate) on success.
int tsp_wav_info(const char* path, int64_t* n_frames, int* sample_rate) {
  WavInfo w;
  if (!open_wav(path, &w)) return 1;
  *n_frames = w.n_frames;
  *sample_rate = w.sample_rate;
  std::fclose(w.f);
  return 0;
}

// Read up to `cap` frames of a wav starting at frame `start` (clamped);
// returns frames read, -1 on error. float32 mono output.
int64_t tsp_read_wav(const char* path, int64_t start, int64_t cap,
                     float* out) {
  WavInfo w;
  if (!open_wav(path, &w)) return -1;
  if (start < 0) start = 0;
  if (start > w.n_frames) start = w.n_frames;
  int64_t n = w.n_frames - start;
  if (n > cap) n = cap;
  bool ok = read_frames(w, start, n, out);
  std::fclose(w.f);
  return ok ? n : -1;
}

// Prepare one SPIRAL pretrain batch: for item i
//   wav   = crop(read(wav_paths[i]), start = floor(crop_u[i] * max(L-crop,0)))
//   p_wav = wav + scale * noise_segment           (if noise_paths[i] != NULL)
//   scale = sqrt(mean(wav^2)+eps / ((mean(seg^2)+eps) * 10^(snr/10)))
// exactly RandomNoisePerturbation.__call__ (data/spiral.py:126-140). Rows
// with unreadable files get wav_lens[i] = -1 (caller falls back to Python).
// Returns the number of failed items.
int tsp_prepare_pretrain_batch(
    const char** wav_paths, const double* crop_u, const char** noise_paths,
    const double* noise_u, const float* snr_db, int b, int64_t crop_size,
    int expected_sr, float* wavs, int32_t* wav_lens, float* p_wavs,
    int32_t* p_wav_lens) {
  int failures = 0;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic) reduction(+ : failures)
#endif
  for (int i = 0; i < b; ++i) {
    float* row = wavs + static_cast<int64_t>(i) * crop_size;
    float* p_row = p_wavs + static_cast<int64_t>(i) * crop_size;
    WavInfo w;
    if (!open_wav(wav_paths[i], &w) ||
        (expected_sr > 0 && w.sample_rate != expected_sr)) {
      if (w.f) std::fclose(w.f);
      wav_lens[i] = -1;
      p_wav_lens[i] = -1;
      ++failures;
      continue;
    }
    int64_t n = w.n_frames < crop_size ? w.n_frames : crop_size;
    int64_t start = 0;
    if (w.n_frames > crop_size) {
      // AudioDataset._load_cropped: start = randrange(L - crop)
      start = static_cast<int64_t>(crop_u[i] *
                                   static_cast<double>(w.n_frames - crop_size));
      if (start > w.n_frames - crop_size) start = w.n_frames - crop_size;
    }
    bool ok = read_frames(w, start, n, row);
    std::fclose(w.f);
    if (!ok) {
      wav_lens[i] = -1;
      p_wav_lens[i] = -1;
      ++failures;
      continue;
    }
    if (n < crop_size)
      std::memset(row + n, 0, (crop_size - n) * sizeof(float));
    wav_lens[i] = static_cast<int32_t>(n);
    p_wav_lens[i] = static_cast<int32_t>(n);

    if (noise_paths[i] == nullptr) {
      std::memcpy(p_row, row, crop_size * sizeof(float));
      continue;
    }
    WavInfo nz;
    if (!open_wav(noise_paths[i], &nz) || nz.n_frames <= 0) {
      if (nz.f) std::fclose(nz.f);
      std::memcpy(p_row, row, crop_size * sizeof(float));
      continue;  // unreadable noise = no perturbation, not a batch failure
    }
    // RandomNoisePerturbation: tile noise to >= n, then
    // start = randrange(max(tiled_len - n, 1))
    int64_t reps = (n + nz.n_frames - 1) / nz.n_frames;
    if (reps < 1) reps = 1;
    int64_t tiled = reps * nz.n_frames;
    int64_t span = tiled - n > 0 ? tiled - n : 1;
    int64_t nstart = static_cast<int64_t>(noise_u[i] *
                                          static_cast<double>(span));
    if (nstart >= span) nstart = span - 1;
    std::vector<float> seg(static_cast<size_t>(n));
    if (!read_noise_segment(nz, nstart, n, seg.data())) {
      std::fclose(nz.f);
      std::memcpy(p_row, row, crop_size * sizeof(float));
      continue;
    }
    std::fclose(nz.f);
    double p_sig = 0.0, p_noise = 0.0;
    for (int64_t j = 0; j < n; ++j) {
      p_sig += static_cast<double>(row[j]) * row[j];
      p_noise += static_cast<double>(seg[j]) * seg[j];
    }
    p_sig = p_sig / n + 1e-12;
    p_noise = p_noise / n + 1e-12;
    const float scale = static_cast<float>(
        std::sqrt(p_sig / (p_noise * std::pow(10.0, snr_db[i] / 10.0))));
    for (int64_t j = 0; j < n; ++j) p_row[j] = row[j] + scale * seg[j];
    if (n < crop_size)
      std::memset(p_row + n, 0, (crop_size - n) * sizeof(float));
  }
  return failures;
}

}  // extern "C"
