// Native audio readers: RIFF/WAVE and Kaldi ark binary objects at offsets.
//
// TPU-native replacement for the reference's kaldiio/soundfile dependency
// surface (dataset/speech_dataset_large.py:109-131): `path` or
// `path:offset` entries resolve to 16 kHz int16 PCM.  Exposed as a plain C
// ABI consumed through ctypes (no pybind11 in this image).
//
// Build: make -C native  (produces libps_audio.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

extern "C" {

// Error codes
enum {
  PS_OK = 0,
  PS_ERR_OPEN = -1,
  PS_ERR_FORMAT = -2,
  PS_ERR_SHORT = -3,
  PS_ERR_UNSUPPORTED = -4,
};

struct WavMeta {
  int32_t sample_rate;
  int32_t num_channels;
  int32_t bits_per_sample;
  int64_t num_frames;   // per channel
  int64_t data_offset;  // absolute file offset of PCM payload
};

// Parse a RIFF/WAVE header starting at `offset` in `path`.
int ps_wav_info(const char* path, int64_t offset, WavMeta* meta) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return PS_ERR_OPEN;
  if (std::fseek(f, (long)offset, SEEK_SET) != 0) {
    std::fclose(f);
    return PS_ERR_OPEN;
  }
  char riff[4], wave[4];
  uint32_t riff_size;
  if (std::fread(riff, 1, 4, f) != 4 || std::memcmp(riff, "RIFF", 4) != 0 ||
      std::fread(&riff_size, 4, 1, f) != 1 ||
      std::fread(wave, 1, 4, f) != 4 || std::memcmp(wave, "WAVE", 4) != 0) {
    std::fclose(f);
    return PS_ERR_FORMAT;
  }
  uint16_t audio_format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  int64_t data_off = -1;
  uint32_t data_size = 0;
  // walk chunks
  for (;;) {
    char id[4];
    uint32_t size;
    if (std::fread(id, 1, 4, f) != 4 || std::fread(&size, 4, 1, f) != 1) break;
    long chunk_start = std::ftell(f);
    if (std::memcmp(id, "fmt ", 4) == 0) {
      uint8_t buf[16];
      if (size < 16 || std::fread(buf, 1, 16, f) != 16) {
        std::fclose(f);
        return PS_ERR_FORMAT;
      }
      std::memcpy(&audio_format, buf + 0, 2);
      std::memcpy(&channels, buf + 2, 2);
      std::memcpy(&sample_rate, buf + 4, 4);
      std::memcpy(&bits, buf + 14, 2);
    } else if (std::memcmp(id, "data", 4) == 0) {
      data_off = chunk_start;
      data_size = size;
      break;  // done
    }
    // chunks are word-aligned
    std::fseek(f, chunk_start + (long)size + (size & 1), SEEK_SET);
  }
  std::fclose(f);
  if (data_off < 0 || sample_rate == 0 || channels == 0) return PS_ERR_FORMAT;
  if (audio_format != 1 || bits != 16) return PS_ERR_UNSUPPORTED;  // PCM16 only
  meta->sample_rate = (int32_t)sample_rate;
  meta->num_channels = (int32_t)channels;
  meta->bits_per_sample = (int32_t)bits;
  meta->num_frames = (int64_t)data_size / (channels * (bits / 8));
  meta->data_offset = data_off;
  return PS_OK;
}

// Read PCM16 frames (channel-averaged to mono if needed is done in Python;
// this returns interleaved samples).
int ps_wav_read(const char* path, int64_t data_offset, int64_t num_values,
                int16_t* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return PS_ERR_OPEN;
  if (std::fseek(f, (long)data_offset, SEEK_SET) != 0) {
    std::fclose(f);
    return PS_ERR_OPEN;
  }
  size_t got = std::fread(out, sizeof(int16_t), (size_t)num_values, f);
  std::fclose(f);
  return got == (size_t)num_values ? PS_OK : PS_ERR_SHORT;
}

struct MatMeta {
  int32_t rows;
  int32_t cols;
  int32_t dtype;        // 4 = float32, 8 = float64
  int64_t data_offset;  // absolute offset of matrix payload
};

// Kaldi binary matrix at `offset`: "\0B" marker, then "FM "/"DM " token,
// then per-dim: '\4' int32 rows, '\4' int32 cols, then row-major data.
int ps_kaldi_mat_info(const char* path, int64_t offset, MatMeta* meta) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return PS_ERR_OPEN;
  if (std::fseek(f, (long)offset, SEEK_SET) != 0) {
    std::fclose(f);
    return PS_ERR_OPEN;
  }
  unsigned char marker[2];
  if (std::fread(marker, 1, 2, f) != 2 || marker[0] != 0 || marker[1] != 'B') {
    std::fclose(f);
    return PS_ERR_FORMAT;
  }
  char tok[3];
  if (std::fread(tok, 1, 3, f) != 3) {
    std::fclose(f);
    return PS_ERR_FORMAT;
  }
  int dtype;
  if (std::memcmp(tok, "FM ", 3) == 0) {
    dtype = 4;
  } else if (std::memcmp(tok, "DM ", 3) == 0) {
    dtype = 8;
  } else {
    std::fclose(f);
    return PS_ERR_UNSUPPORTED;
  }
  unsigned char sz;
  int32_t rows, cols;
  if (std::fread(&sz, 1, 1, f) != 1 || sz != 4 ||
      std::fread(&rows, 4, 1, f) != 1 || std::fread(&sz, 1, 1, f) != 1 ||
      sz != 4 || std::fread(&cols, 4, 1, f) != 1) {
    std::fclose(f);
    return PS_ERR_FORMAT;
  }
  meta->rows = rows;
  meta->cols = cols;
  meta->dtype = dtype;
  meta->data_offset = std::ftell(f);
  std::fclose(f);
  return PS_OK;
}

int ps_kaldi_mat_read(const char* path, int64_t data_offset, int64_t num_bytes,
                      char* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return PS_ERR_OPEN;
  if (std::fseek(f, (long)data_offset, SEEK_SET) != 0) {
    std::fclose(f);
    return PS_ERR_OPEN;
  }
  size_t got = std::fread(out, 1, (size_t)num_bytes, f);
  std::fclose(f);
  return got == (size_t)num_bytes ? PS_OK : PS_ERR_SHORT;
}

}  // extern "C"
