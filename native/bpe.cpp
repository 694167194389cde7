// CLIP BPE tokenizer core, C++.
//
// Native encode path for the serving layer: the per-request CPU cost in a
// continuous-batching frontend is tokenization, and the Python merge loop
// is the hot spot. Same algorithm and id space as
// tinyfusers_tpu/tokenizer/bpe.py (which stays as the reference/fallback
// implementation); loaded via ctypes from tokenizer/native.py.
//
// Contract:
//  - input is a '\n'-joined list of WORDS, already lowercased,
//    whitespace-normalized, and split by the CLIP word regex. The
//    unicode-aware regex ([\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+) lives in
//    exactly one place — Python (tokenizer/bpe.py words()) — so the two
//    implementations cannot drift on word boundaries; C++ owns only the
//    hot merge loop. (Words can never contain whitespace post-split, so
//    '\n' is a safe separator.)
//  - merges blob is the CLIP merges file content WITHOUT the version
//    header line (UTF-8, one "a b" pair per line).
//
// C API (stable, ctypes-friendly):
//   void*  tf_bpe_create(const char* merges, long len);
//   int    tf_bpe_encode_words(void* h, const char* words, int len,
//                              int* out, int cap);  // returns n tokens
//   void   tf_bpe_destroy(void* h);

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// Byte -> mapped-unicode codepoint table, CLIP ordering (printables keep
// their codepoint; the rest shift into 0x100+). Returns codepoints; the
// base-vocab id of a byte is its position in this construction order.
struct ByteMap {
  uint32_t cp[256];        // byte -> codepoint
  int order[256];          // byte -> base vocab id
  ByteMap() {
    bool printable[256] = {false};
    auto mark = [&](int lo, int hi) { for (int b = lo; b <= hi; ++b) printable[b] = true; };
    mark(0x21, 0x7e);  // '!'..'~'
    mark(0xa1, 0xac);  // U+00A1..U+00AC
    mark(0xae, 0xff);  // U+00AE..U+00FF
    int idx = 0;
    for (int b = 0; b < 256; ++b)
      if (printable[b]) { cp[b] = (uint32_t)b; order[b] = idx++; }
    int shift = 0;
    for (int b = 0; b < 256; ++b)
      if (!printable[b]) { cp[b] = 256 + shift++; order[b] = idx++; }
  }
};

const ByteMap kByteMap;

void append_utf8(std::string& s, uint32_t cp) {
  if (cp < 0x80) {
    s.push_back((char)cp);
  } else if (cp < 0x800) {
    s.push_back((char)(0xc0 | (cp >> 6)));
    s.push_back((char)(0x80 | (cp & 0x3f)));
  } else {
    s.push_back((char)(0xe0 | (cp >> 12)));
    s.push_back((char)(0x80 | ((cp >> 6) & 0x3f)));
    s.push_back((char)(0x80 | (cp & 0x3f)));
  }
}

struct Tokenizer {
  std::unordered_map<std::string, int> encoder;  // symbol -> id
  std::unordered_map<std::string, int> ranks;    // "a\x00b" -> rank
  std::unordered_map<std::string, std::vector<int>> cache;
  int sot_id = 0, eot_id = 0;  // 512 + n_merges (+1); 49406/49407 for CLIP

  explicit Tokenizer(const std::string& merges_blob) {
    // Base vocab: 256 byte symbols in ByteMap order, then </w> variants.
    std::string base[256];
    for (int b = 0; b < 256; ++b) {
      std::string s;
      append_utf8(s, kByteMap.cp[b]);
      base[kByteMap.order[b]] = s;
    }
    for (int i = 0; i < 256; ++i) encoder.emplace(base[i], i);
    for (int i = 0; i < 256; ++i) encoder.emplace(base[i] + "</w>", 256 + i);

    // Merges: one per line, "first second". Vocab id = 512 + rank.
    size_t pos = 0;
    int rank = 0;
    const size_t kMaxMerges = 49152 - 256 - 2 - 256;  // CLIP count: 48894
    while (pos < merges_blob.size() && (size_t)rank < kMaxMerges) {
      size_t eol = merges_blob.find('\n', pos);
      if (eol == std::string::npos) eol = merges_blob.size();
      std::string line = merges_blob.substr(pos, eol - pos);
      pos = eol + 1;
      if (line.empty()) continue;
      size_t sp = line.find(' ');
      if (sp == std::string::npos) continue;
      std::string a = line.substr(0, sp), b = line.substr(sp + 1);
      if (!b.empty() && b.back() == '\r') b.pop_back();
      ranks.emplace(a + '\0' + b, rank);
      encoder.emplace(a + b, 512 + rank);
      ++rank;
    }
    // Specials take the next two ids (= 49406/49407 with the real
    // 48894-merge CLIP file), mirroring bpe.py's vocab construction.
    sot_id = 512 + rank;
    eot_id = 512 + rank + 1;
    encoder.emplace("<|startoftext|>", sot_id);
    encoder.emplace("<|endoftext|>", eot_id);
    cache.emplace("<|startoftext|>", std::vector<int>{sot_id});
    cache.emplace("<|endoftext|>", std::vector<int>{eot_id});
  }

  // BPE-merge one word (raw bytes); append resulting ids.
  void encode_word(const std::string& word, std::vector<int>& out) {
    auto it = cache.find(word);
    if (it != cache.end()) {
      out.insert(out.end(), it->second.begin(), it->second.end());
      return;
    }
    std::vector<std::string> syms;
    syms.reserve(word.size());
    for (size_t i = 0; i < word.size(); ++i) {
      std::string s;
      append_utf8(s, kByteMap.cp[(unsigned char)word[i]]);
      syms.push_back(std::move(s));
    }
    if (!syms.empty()) syms.back() += "</w>";

    while (syms.size() > 1) {
      int best_rank = INT32_MAX;
      size_t best_i = 0;
      for (size_t i = 0; i + 1 < syms.size(); ++i) {
        auto r = ranks.find(syms[i] + '\0' + syms[i + 1]);
        if (r != ranks.end() && r->second < best_rank) {
          best_rank = r->second;
          best_i = i;
        }
      }
      if (best_rank == INT32_MAX) break;
      // Merge ALL occurrences of the best pair left-to-right.
      const std::string a = syms[best_i], b = syms[best_i + 1];
      std::vector<std::string> merged;
      merged.reserve(syms.size());
      for (size_t i = 0; i < syms.size();) {
        if (i + 1 < syms.size() && syms[i] == a && syms[i + 1] == b) {
          merged.push_back(a + b);
          i += 2;
        } else {
          merged.push_back(syms[i]);
          i += 1;
        }
      }
      syms.swap(merged);
    }

    std::vector<int> ids;
    ids.reserve(syms.size());
    for (auto& s : syms) {
      auto e = encoder.find(s);
      if (e != encoder.end()) ids.push_back(e->second);
      // unknown symbols are impossible by construction (all byte pairs
      // descend from base symbols); skip defensively if not found.
    }
    cache.emplace(word, ids);
    out.insert(out.end(), ids.begin(), ids.end());
  }

  // Encode '\n'-joined pre-split words (see file header contract).
  void encode_words(const char* words, int len, std::vector<int>& out) {
    int i = 0;
    while (i < len) {
      int j = i;
      while (j < len && words[j] != '\n') ++j;
      if (j > i) encode_word(std::string(words + i, j - i), out);
      i = j + 1;
    }
  }
};

}  // namespace

extern "C" {

void* tf_bpe_create(const char* merges, long len) {
  return new Tokenizer(std::string(merges, (size_t)len));
}

int tf_bpe_encode_words(void* h, const char* words, int len, int* out,
                        int cap) {
  auto* tok = static_cast<Tokenizer*>(h);
  std::vector<int> ids;
  tok->encode_words(words, len, ids);
  int n = (int)ids.size();
  if (n > cap) n = cap;
  for (int i = 0; i < n; ++i) out[i] = ids[i];
  return n;
}

void tf_bpe_destroy(void* h) { delete static_cast<Tokenizer*>(h); }

}  // extern "C"
