// Native FLAC decoder (host data-pipeline hot path).
//
// TPU-native replacement for the reference's torchaudio/libFLAC flac read
// (dataset/speech_dataset_large.py:119-123).  Implements the full frame
// spec emitted by libFLAC encodes: CONSTANT / VERBATIM / FIXED(0-4) / LPC
// subframes, 4/5-bit rice residuals with escape partitions, wasted bits,
// and the four channel assignments.  Mirrors ps_slm_tpu/data/flac.py (the
// pure-Python reference implementation used as its test oracle).
//
// C ABI (ctypes):
//   ps_flac_info(path, offset, FlacMeta*)         -> 0 on success
//   ps_flac_read(path, offset, int32* out, cap)   -> samples written or <0
//     `out` receives interleaved int32 PCM scaled to the stream bps.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

enum {
  PS_FLAC_OK = 0,
  PS_FLAC_ERR_OPEN = -1,
  PS_FLAC_ERR_FORMAT = -2,
  PS_FLAC_ERR_SHORT = -3,
  PS_FLAC_ERR_UNSUPPORTED = -4,
};

struct FlacMeta {
  int32_t sample_rate;
  int32_t num_channels;
  int32_t bits_per_sample;
  int64_t total_samples;  // per channel; 0 if unknown
};

}  // extern "C"

namespace {

class BitReader {
 public:
  BitReader(const uint8_t* data, size_t size, size_t byte_pos)
      : data_(data), size_bits_(size * 8), pos_(byte_pos * 8) {}

  bool ok() const { return ok_; }
  size_t byte_pos() const { return pos_ >> 3; }
  bool exhausted() const { return pos_ >= size_bits_; }

  uint64_t read(int n) {
    uint64_t out = 0;
    if (pos_ + n > size_bits_) {
      ok_ = false;
      return 0;
    }
    while (n > 0) {
      uint8_t byte = data_[pos_ >> 3];
      int avail = 8 - (pos_ & 7);
      int take = avail < n ? avail : n;
      int shift = avail - take;
      out = (out << take) | ((byte >> shift) & ((1u << take) - 1));
      pos_ += take;
      n -= take;
    }
    return out;
  }

  int64_t read_signed(int n) {
    uint64_t v = read(n);
    if (v >= (1ull << (n - 1))) return (int64_t)v - (1ll << n);
    return (int64_t)v;
  }

  int read_unary() {
    int count = 0;
    for (;;) {
      if (pos_ >= size_bits_) {
        ok_ = false;
        return 0;
      }
      uint8_t byte = data_[pos_ >> 3];
      int rem = 8 - (pos_ & 7);
      uint8_t chunk = byte & ((1u << rem) - 1);
      if (chunk == 0) {
        count += rem;
        pos_ += rem;
        continue;
      }
      int msb = 31 - __builtin_clz((unsigned)chunk);
      int lead = rem - 1 - msb;
      count += lead;
      pos_ += lead + 1;
      return count;
    }
  }

  void align() { pos_ = (pos_ + 7) & ~(size_t)7; }

 private:
  const uint8_t* data_;
  size_t size_bits_;
  size_t pos_;
  bool ok_ = true;
};

uint64_t read_utf8_coded(BitReader& br) {
  uint64_t b0 = br.read(8);
  if (b0 < 0x80) return b0;
  int n = 0;
  uint64_t mask = 0x40;
  while (b0 & mask) {
    n += 1;
    mask >>= 1;
  }
  uint64_t v = b0 & (mask - 1);
  for (int i = 0; i < n; i++) v = (v << 6) | (br.read(8) & 0x3F);
  return v;
}

const int kBlockSizeTable[16] = {0,   192,  576,  1152, 2304, 4608, -1, -2,
                                 256, 512,  1024, 2048, 4096, 8192,
                                 16384, 32768};
const int kSampleRateTable[16] = {0,     88200, 176400, 192000, 8000, 16000,
                                  22050, 24000, 32000,  44100,  48000, 96000,
                                  -1,    -2,    -3,     0};
const int kSampleSizeTable[8] = {0, 8, 12, 0, 16, 20, 24, 32};
const int kFixedCoefs[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool decode_residual(BitReader& br, int block_size, int order,
                     std::vector<int64_t>& res) {
  int method = (int)br.read(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint64_t escape = (1ull << plen) - 1;
  int part_order = (int)br.read(4);
  int n_parts = 1 << part_order;
  int part_samples = block_size >> part_order;
  res.clear();
  res.reserve(block_size - order);
  for (int p = 0; p < n_parts; p++) {
    int n = part_samples - (p == 0 ? order : 0);
    uint64_t param = br.read(plen);
    if (param == escape) {
      int bits = (int)br.read(5);
      for (int i = 0; i < n; i++)
        res.push_back(bits ? br.read_signed(bits) : 0);
    } else {
      for (int i = 0; i < n; i++) {
        uint64_t q = (uint64_t)br.read_unary();
        uint64_t v = param ? ((q << param) | br.read((int)param)) : q;
        res.push_back((int64_t)(v >> 1) ^ -(int64_t)(v & 1));  // zigzag
      }
    }
    if (!br.ok()) return false;
  }
  return true;
}

bool decode_subframe(BitReader& br, int block_size, int bps,
                     std::vector<int64_t>& out) {
  if (br.read(1) != 0) return false;
  int sftype = (int)br.read(6);
  int wasted = 0;
  if (br.read(1)) {
    wasted = 1 + br.read_unary();
    bps -= wasted;
  }
  out.assign(block_size, 0);

  if (sftype == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < block_size; i++) out[i] = v;
  } else if (sftype == 1) {  // VERBATIM
    for (int i = 0; i < block_size; i++) out[i] = br.read_signed(bps);
  } else if (sftype >= 8 && sftype <= 12) {  // FIXED
    int order = sftype - 8;
    for (int i = 0; i < order; i++) out[i] = br.read_signed(bps);
    std::vector<int64_t> res;
    if (!decode_residual(br, block_size, order, res)) return false;
    const int* c = kFixedCoefs[order];
    for (int i = order; i < block_size; i++) {
      int64_t acc = res[i - order];
      for (int j = 0; j < order; j++) acc += (int64_t)c[j] * out[i - 1 - j];
      out[i] = acc;
    }
  } else if (sftype >= 32) {  // LPC
    int order = sftype - 31;
    for (int i = 0; i < order; i++) out[i] = br.read_signed(bps);
    int precision = (int)br.read(4) + 1;
    if (precision == 16) return false;  // escape value
    int shift = (int)br.read_signed(5);
    std::vector<int64_t> coefs(order);
    for (int i = 0; i < order; i++) coefs[i] = br.read_signed(precision);
    std::vector<int64_t> res;
    if (!decode_residual(br, block_size, order, res)) return false;
    for (int i = order; i < block_size; i++) {
      int64_t acc = 0;
      for (int j = 0; j < order; j++) acc += coefs[j] * out[i - 1 - j];
      out[i] = res[i - order] + (acc >> shift);
    }
  } else {
    return false;
  }
  if (wasted)
    for (auto& v : out) v <<= wasted;
  return br.ok();
}

// Decode one frame; appends interleaved samples. Returns block size or <0.
int decode_frame(BitReader& br, int strm_bps, int strm_channels,
                 std::vector<int32_t>& pcm, int* rate_out) {
  if (br.read(14) != 0x3FFE) return PS_FLAC_ERR_FORMAT;
  br.read(1);
  br.read(1);
  int bs_code = (int)br.read(4);
  int sr_code = (int)br.read(4);
  int ch_code = (int)br.read(4);
  int ss_code = (int)br.read(3);
  br.read(1);
  read_utf8_coded(br);

  int block_size = kBlockSizeTable[bs_code];
  if (block_size == -1)
    block_size = (int)br.read(8) + 1;
  else if (block_size == -2)
    block_size = (int)br.read(16) + 1;
  else if (block_size == 0)
    return PS_FLAC_ERR_FORMAT;

  int rate = kSampleRateTable[sr_code];
  if (rate == -1)
    rate = (int)br.read(8) * 1000;
  else if (rate == -2)
    rate = (int)br.read(16);
  else if (rate == -3)
    rate = (int)br.read(16) * 10;
  if (rate) *rate_out = rate;

  int bps = kSampleSizeTable[ss_code];
  if (bps == 0) bps = strm_bps;
  br.read(8);  // header crc8

  std::vector<std::vector<int64_t>> chans;
  if (ch_code < 8) {
    int n_ch = ch_code + 1;
    if (n_ch != strm_channels) return PS_FLAC_ERR_FORMAT;
    chans.resize(n_ch);
    for (int c = 0; c < n_ch; c++)
      if (!decode_subframe(br, block_size, bps, chans[c]))
        return PS_FLAC_ERR_FORMAT;
  } else if (ch_code == 8) {  // left/side
    chans.resize(2);
    std::vector<int64_t> side;
    if (!decode_subframe(br, block_size, bps, chans[0]) ||
        !decode_subframe(br, block_size, bps + 1, side))
      return PS_FLAC_ERR_FORMAT;
    chans[1].resize(block_size);
    for (int i = 0; i < block_size; i++) chans[1][i] = chans[0][i] - side[i];
  } else if (ch_code == 9) {  // right/side
    chans.resize(2);
    std::vector<int64_t> side;
    if (!decode_subframe(br, block_size, bps + 1, side) ||
        !decode_subframe(br, block_size, bps, chans[1]))
      return PS_FLAC_ERR_FORMAT;
    chans[0].resize(block_size);
    for (int i = 0; i < block_size; i++) chans[0][i] = chans[1][i] + side[i];
  } else if (ch_code == 10) {  // mid/side
    chans.resize(2);
    std::vector<int64_t> mid, side;
    if (!decode_subframe(br, block_size, bps, mid) ||
        !decode_subframe(br, block_size, bps + 1, side))
      return PS_FLAC_ERR_FORMAT;
    chans[0].resize(block_size);
    chans[1].resize(block_size);
    for (int i = 0; i < block_size; i++) {
      int64_t m2 = (mid[i] << 1) | (side[i] & 1);
      chans[0][i] = (m2 + side[i]) >> 1;
      chans[1][i] = (m2 - side[i]) >> 1;
    }
  } else {
    return PS_FLAC_ERR_FORMAT;
  }

  br.align();
  br.read(16);  // frame crc16
  if (!br.ok()) return PS_FLAC_ERR_SHORT;

  int n_ch = (int)chans.size();
  size_t base = pcm.size();
  pcm.resize(base + (size_t)block_size * n_ch);
  for (int i = 0; i < block_size; i++)
    for (int c = 0; c < n_ch; c++)
      pcm[base + (size_t)i * n_ch + c] = (int32_t)chans[c][i];
  return block_size;
}

struct Stream {
  std::vector<uint8_t> data;
  size_t frames_start = 0;
  FlacMeta meta{};
};

int open_stream(const char* path, int64_t offset, Stream* s) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return PS_FLAC_ERR_OPEN;
  std::fseek(f, 0, SEEK_END);
  long end = std::ftell(f);
  if (offset < 0 || offset >= end) {
    std::fclose(f);
    return PS_FLAC_ERR_OPEN;
  }
  std::fseek(f, (long)offset, SEEK_SET);
  s->data.resize((size_t)(end - offset));
  size_t got = std::fread(s->data.data(), 1, s->data.size(), f);
  std::fclose(f);
  s->data.resize(got);
  if (got < 42 || std::memcmp(s->data.data(), "fLaC", 4) != 0)
    return PS_FLAC_ERR_FORMAT;

  size_t pos = 4;
  bool have_info = false;
  for (;;) {
    if (pos + 4 > got) return PS_FLAC_ERR_SHORT;
    uint8_t hdr = s->data[pos];
    bool last = hdr & 0x80;
    int btype = hdr & 0x7F;
    uint32_t length = ((uint32_t)s->data[pos + 1] << 16) |
                      ((uint32_t)s->data[pos + 2] << 8) | s->data[pos + 3];
    if (btype == 0 && pos + 4 + 18 <= got) {
      const uint8_t* si = s->data.data() + pos + 4;
      uint64_t bits = 0;
      for (int i = 0; i < 8; i++) bits = (bits << 8) | si[10 + i];
      s->meta.sample_rate = (int32_t)((bits >> 44) & 0xFFFFF);
      s->meta.num_channels = (int32_t)(((bits >> 41) & 0x7) + 1);
      s->meta.bits_per_sample = (int32_t)(((bits >> 36) & 0x1F) + 1);
      s->meta.total_samples = (int64_t)(bits & ((1ull << 36) - 1));
      have_info = true;
    }
    pos += 4 + length;
    if (last) break;
  }
  if (!have_info || pos > got) return PS_FLAC_ERR_FORMAT;
  s->frames_start = pos;
  return PS_FLAC_OK;
}

}  // namespace

extern "C" {

int ps_flac_info(const char* path, int64_t offset, FlacMeta* meta) {
  // Header-only: STREAMINFO is the mandatory FIRST metadata block (FLAC
  // spec), so 42 bytes suffice — the resume fast-forward calls this per
  // skipped utterance and must not pay a full-file read (open_stream
  // slurps to EOF for the decode path).
  FILE* f = std::fopen(path, "rb");
  if (!f) return PS_FLAC_ERR_OPEN;
  if (offset < 0 || std::fseek(f, (long)offset, SEEK_SET) != 0) {
    std::fclose(f);
    return PS_FLAC_ERR_OPEN;
  }
  uint8_t buf[42];
  size_t got = std::fread(buf, 1, sizeof(buf), f);
  std::fclose(f);
  if (got == 0) return PS_FLAC_ERR_OPEN;
  if (got < sizeof(buf) || std::memcmp(buf, "fLaC", 4) != 0)
    return PS_FLAC_ERR_FORMAT;
  if ((buf[4] & 0x7F) != 0) return PS_FLAC_ERR_FORMAT;  // not STREAMINFO
  const uint8_t* si = buf + 8;
  uint64_t bits = 0;
  for (int i = 0; i < 8; i++) bits = (bits << 8) | si[10 + i];
  meta->sample_rate = (int32_t)((bits >> 44) & 0xFFFFF);
  meta->num_channels = (int32_t)(((bits >> 41) & 0x7) + 1);
  meta->bits_per_sample = (int32_t)(((bits >> 36) & 0x1F) + 1);
  meta->total_samples = (int64_t)(bits & ((1ull << 36) - 1));
  return PS_FLAC_OK;
}

// Decode all samples; returns per-channel sample count or error (<0).
// `out` must hold at least `capacity` int32 values (interleaved).
int64_t ps_flac_read(const char* path, int64_t offset, int32_t* out,
                     int64_t capacity) {
  Stream s;
  int rc = open_stream(path, offset, &s);
  if (rc != PS_FLAC_OK) return rc;

  BitReader br(s.data.data(), s.data.size(), s.frames_start);
  std::vector<int32_t> pcm;
  int rate = s.meta.sample_rate;
  int64_t got = 0;
  while ((s.meta.total_samples == 0 || got < s.meta.total_samples) &&
         !br.exhausted()) {
    int n = decode_frame(br, s.meta.bits_per_sample, s.meta.num_channels,
                         pcm, &rate);
    if (n < 0) return n;
    got += n;
  }
  // clamp DOWN to STREAMINFO's count (a final frame may pad past it) but
  // never up: forcing got = total_samples on a truncated stream made the
  // memcpy read past pcm's heap allocation
  if (s.meta.total_samples && got > s.meta.total_samples)
    got = s.meta.total_samples;
  int64_t want = got * s.meta.num_channels;
  if (want > (int64_t)pcm.size()) want = (int64_t)pcm.size();
  got = want / (s.meta.num_channels ? s.meta.num_channels : 1);
  want = got * s.meta.num_channels;
  if (want > capacity) return PS_FLAC_ERR_SHORT;
  std::memcpy(out, pcm.data(), (size_t)want * sizeof(int32_t));
  return got;
}

}  // extern "C"
