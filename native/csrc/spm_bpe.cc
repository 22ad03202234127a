// SentencePiece-compatible BPE encoder, C++ (host hot path).
//
// Same semantics as ps_slm_tpu/data/spm.py (the always-available Python
// reference): minimal ModelProto reader + greedy highest-score-pair BPE with
// byte fallback.  Replaces the reference's C++ sentencepiece dependency
// (Multitask/model/tokenizer.py:5-29) for per-step GT-text tokenization.
//
// C ABI for ctypes.

#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Piece {
  std::string text;
  float score;
  int type;  // 1 normal, 2 unk, 3 control, 4 user, 6 byte
};

struct Model {
  std::vector<Piece> pieces;
  std::unordered_map<std::string, int> piece_to_id;
  std::unordered_map<std::string, float> scores;
  int unk_id = 0;
  int byte_ids[256];
  bool has_bytes = false;
};

bool read_varint(const uint8_t* buf, size_t len, size_t& pos, uint64_t& out) {
  out = 0;
  int shift = 0;
  while (pos < len) {
    uint8_t b = buf[pos++];
    out |= (uint64_t)(b & 0x7F) << shift;
    if (!(b & 0x80)) return true;
    shift += 7;
    if (shift > 63) return false;
  }
  return false;
}

bool skip_field(const uint8_t* buf, size_t len, size_t& pos, int wt) {
  uint64_t tmp;
  switch (wt) {
    case 0:
      return read_varint(buf, len, pos, tmp);
    case 1:
      pos += 8;
      return pos <= len;
    case 2:
      if (!read_varint(buf, len, pos, tmp)) return false;
      pos += tmp;
      return pos <= len;
    case 5:
      pos += 4;
      return pos <= len;
    default:
      return false;
  }
}

bool parse_piece(const uint8_t* buf, size_t len, Piece& p) {
  size_t pos = 0;
  p.text.clear();
  p.score = 0.0f;
  p.type = 1;
  while (pos < len) {
    uint64_t tag;
    if (!read_varint(buf, len, pos, tag)) return false;
    int field = (int)(tag >> 3), wt = (int)(tag & 7);
    if (field == 1 && wt == 2) {
      uint64_t ln;
      if (!read_varint(buf, len, pos, ln) || pos + ln > len) return false;
      p.text.assign((const char*)buf + pos, ln);
      pos += ln;
    } else if (field == 2 && wt == 5) {
      if (pos + 4 > len) return false;
      std::memcpy(&p.score, buf + pos, 4);
      pos += 4;
    } else if (field == 3 && wt == 0) {
      uint64_t t;
      if (!read_varint(buf, len, pos, t)) return false;
      p.type = (int)t;
    } else {
      if (!skip_field(buf, len, pos, wt)) return false;
    }
  }
  return true;
}

// UTF-8 codepoint split
void utf8_split(const std::string& s, std::vector<std::string>& out) {
  out.clear();
  size_t i = 0;
  while (i < s.size()) {
    unsigned char c = s[i];
    size_t n = (c < 0x80) ? 1 : (c < 0xE0) ? 2 : (c < 0xF0) ? 3 : 4;
    if (i + n > s.size()) n = 1;
    out.emplace_back(s.substr(i, n));
    i += n;
  }
}

}  // namespace

extern "C" {

void* ps_spm_load(const char* model_path) {
  FILE* f = std::fopen(model_path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(size);
  if (std::fread(data.data(), 1, size, f) != (size_t)size) {
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);

  Model* m = new Model();
  std::memset(m->byte_ids, -1, sizeof(m->byte_ids));
  size_t pos = 0;
  while (pos < data.size()) {
    uint64_t tag;
    if (!read_varint(data.data(), data.size(), pos, tag)) break;
    int field = (int)(tag >> 3), wt = (int)(tag & 7);
    if (field == 1 && wt == 2) {
      uint64_t ln;
      if (!read_varint(data.data(), data.size(), pos, ln) ||
          pos + ln > data.size())
        break;
      Piece p;
      if (!parse_piece(data.data() + pos, ln, p)) {
        // a skipped piece would silently shift every subsequent vocab id
        // away from the Python reference (data/spm.py) — fail the load
        // instead and let the caller fall back
        delete m;
        return nullptr;
      }
      int id = (int)m->pieces.size();
      if (!m->piece_to_id.count(p.text)) {
        m->piece_to_id[p.text] = id;
        m->scores[p.text] = p.score;
      }
      if (p.type == 2) m->unk_id = id;
      if (p.type == 6 && p.text.size() == 6 &&
          p.text.compare(0, 3, "<0x") == 0 && p.text[5] == '>' &&
          std::isxdigit((unsigned char)p.text[3]) &&
          std::isxdigit((unsigned char)p.text[4])) {
        // "<0xNN>"; strict match — std::stoi on an arbitrary type-6
        // piece could throw across the C ABI
        int v = (int)std::strtol(p.text.substr(3, 2).c_str(), nullptr, 16);
        m->byte_ids[v] = id;
        m->has_bytes = true;
      }
      m->pieces.push_back(std::move(p));
      pos += ln;
    } else {
      if (!skip_field(data.data(), data.size(), pos, wt)) break;
    }
  }
  if (m->pieces.empty()) {
    delete m;
    return nullptr;
  }
  return m;
}

void ps_spm_free(void* h) { delete (Model*)h; }

int ps_spm_vocab_size(void* h) { return (int)((Model*)h)->pieces.size(); }

// piece text for id; returns length copied (truncated to max_len)
int ps_spm_id_to_piece(void* h, int id, char* out, int max_len) {
  Model* m = (Model*)h;
  if (id < 0 || id >= (int)m->pieces.size()) return -1;
  const std::string& s = m->pieces[id].text;
  int n = (int)s.size() < max_len ? (int)s.size() : max_len;
  std::memcpy(out, s.data(), n);
  return n;
}

static void encode_word(Model* m, const std::string& word,
                        std::vector<int>& ids) {
  std::vector<std::string> syms;
  utf8_split(word, syms);
  if (syms.empty()) return;
  // greedy best-score merges
  for (;;) {
    float best_score = 0.0f;
    int best_idx = -1;
    bool found = false;
    for (size_t i = 0; i + 1 < syms.size(); ++i) {
      auto it = m->scores.find(syms[i] + syms[i + 1]);
      if (it != m->scores.end() && (!found || it->second > best_score)) {
        best_score = it->second;
        best_idx = (int)i;
        found = true;
      }
    }
    if (!found) break;
    syms[best_idx] += syms[best_idx + 1];
    syms.erase(syms.begin() + best_idx + 1);
  }
  for (const auto& s : syms) {
    auto it = m->piece_to_id.find(s);
    if (it != m->piece_to_id.end()) {
      ids.push_back(it->second);
    } else if (m->has_bytes) {
      for (unsigned char c : s) {
        int bid = m->byte_ids[c];
        ids.push_back(bid >= 0 ? bid : m->unk_id);
      }
    } else {
      ids.push_back(m->unk_id);
    }
  }
}

int ps_spm_encode(void* h, const char* text, int* out_ids, int max_ids) {
  Model* m = (Model*)h;
  std::vector<int> ids;
  const char* ws = "\xE2\x96\x81";  // U+2581
  std::string s(text);
  size_t start = 0;
  while (start <= s.size()) {
    size_t sp = s.find(' ', start);
    size_t end = (sp == std::string::npos) ? s.size() : sp;
    if (end > start) {
      encode_word(m, ws + s.substr(start, end - start), ids);
    }
    if (sp == std::string::npos) break;
    start = sp + 1;
  }
  int n = (int)ids.size() < max_ids ? (int)ids.size() : max_ids;
  std::memcpy(out_ids, ids.data(), n * sizeof(int));
  return (int)ids.size();
}

}  // extern "C"
