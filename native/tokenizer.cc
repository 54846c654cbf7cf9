/* Byte-level BPE encoder with greedy highest-score heap merges.
 *
 * Native counterpart of the reference tokenizer (src/tokenizer.c): vocab
 * pieces and merge scores come from the model container's tokenizer.tokens /
 * tokenizer.scores tensors; encoding scans <|...|> special tokens, groups
 * UTF-8 codepoints with per-byte fallback, then merges adjacent pairs by
 * score through a max-heap (src/tokenizer.c:90-201). Re-designed in C++:
 * hash-map piece lookup instead of bsearch (pieces need not be sorted),
 * stale-entry heap like the Python reference implementation so both produce
 * identical ids.
 */
#include "calm_native.h"

#include <algorithm>
#include <cstring>
#include <queue>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {
constexpr size_t kMaxTokenLength = 512;
}

struct cn_tokenizer {
  std::string blob;                   // owned copy of all pieces
  std::vector<std::string_view> pieces;
  std::vector<float> scores;
  std::unordered_map<std::string_view, int> lookup;
  int bos_id = -1;
  int byte_fallbacks = -1;  // id of <0x00>

  int find(std::string_view p) const {
    auto it = lookup.find(p);
    return it == lookup.end() ? -1 : it->second;
  }
};

extern "C" {

cn_tokenizer* cn_tokenizer_create(const uint8_t* pieces_blob, size_t blob_len,
                                  const float* scores, int vocab_size,
                                  int bos_id) {
  if (!pieces_blob || !scores || vocab_size <= 0) return nullptr;
  if (blob_len == 0 || pieces_blob[blob_len - 1] != 0) return nullptr;

  auto* tk = new cn_tokenizer();
  tk->blob.assign((const char*)pieces_blob, blob_len);
  tk->bos_id = bos_id;
  tk->pieces.reserve(vocab_size);
  tk->scores.assign(scores, scores + vocab_size);

  const char* p = tk->blob.data();
  const char* end = p + tk->blob.size();
  for (int i = 0; i < vocab_size; i++) {
    const char* nul = (const char*)memchr(p, 0, (size_t)(end - p));
    if (!nul || (size_t)(nul - p) > kMaxTokenLength) {
      delete tk;
      return nullptr;
    }
    tk->pieces.emplace_back(p, (size_t)(nul - p));
    p = nul + 1;
  }
  if (p != end) {  // trailing garbage = piece count mismatch
    delete tk;
    return nullptr;
  }
  for (int i = 0; i < vocab_size; i++) {
    std::string_view piece = tk->pieces[i];
    if (!piece.empty()) tk->lookup.emplace(piece, i);  // first id wins
  }
  tk->byte_fallbacks = tk->find("<0x00>");
  return tk;
}

void cn_tokenizer_free(cn_tokenizer* tk) { delete tk; }

int cn_tokenizer_find(const cn_tokenizer* tk, const uint8_t* piece, size_t len) {
  return tk->find(std::string_view((const char*)piece, len));
}

int cn_tokenizer_encode(const cn_tokenizer* tk, const uint8_t* text,
                        size_t len, int add_bos, int* out, size_t out_cap) {
  std::vector<int> toks;
  toks.reserve(len + 3);
  if (add_bos && tk->bos_id >= 0) toks.push_back(tk->bos_id);

  const char* data = (const char*)text;
  size_t i = 0;
  while (i < len) {
    // special token scan: "<|" ... first "|>" encoded atomically if in vocab
    if (data[i] == '<' && i + 1 < len && data[i + 1] == '|') {
      const char* close = (const char*)memmem(data + i + 2, len - i - 2, "|>", 2);
      if (close) {
        size_t j = (size_t)(close - data);
        if (j + 2 - i <= kMaxTokenLength) {
          int sid = tk->find(std::string_view(data + i, j + 2 - i));
          if (sid != -1) {
            toks.push_back(sid);
            i = j + 2;
            continue;
          }
        }
      }
    }

    // group a UTF-8 codepoint (lead 11xxxxxx + continuation bytes)
    size_t j = i + 1;
    if ((data[i] & 0xC0) == 0xC0)
      while (j < len && j - i < 4 && (data[j] & 0xC0) == 0x80) j++;

    int tid = tk->find(std::string_view(data + i, j - i));
    if (tid != -1) {
      toks.push_back(tid);
    } else if (tk->byte_fallbacks >= 0) {
      for (size_t b = i; b < j; b++)
        toks.push_back((uint8_t)data[b] + tk->byte_fallbacks);
    }
    i = j;
  }

  // greedy highest-score pair merging; stale heap entries are skipped
  // exactly like the reference (src/tokenizer.c:151-201)
  struct Entry {
    float neg_score;
    int lpos, lid, rpos, rid, resid;
    // full lexicographic tiebreak = the Python reference's heap tuple
    // (-score, lpos, lid, rpos, rid, tid): identical ids on identical input
    bool operator>(const Entry& o) const {
      if (neg_score != o.neg_score) return neg_score > o.neg_score;
      if (lpos != o.lpos) return lpos > o.lpos;
      if (lid != o.lid) return lid > o.lid;
      if (rpos != o.rpos) return rpos > o.rpos;
      if (rid != o.rid) return rid > o.rid;
      return resid > o.resid;
    }
  };
  std::priority_queue<Entry, std::vector<Entry>, std::greater<Entry>> heap;
  std::string merged;

  auto tryadd = [&](int lpos, int lid, int rpos, int rid) {
    merged.assign(tk->pieces[lid]);
    merged.append(tk->pieces[rid]);
    int tid = tk->find(merged);
    if (tid != -1)
      heap.push(Entry{-tk->scores[tid], lpos, lid, rpos, rid, tid});
  };

  int n = (int)toks.size();
  for (int k = 0; k + 1 < n; k++) tryadd(k, toks[k], k + 1, toks[k + 1]);

  while (!heap.empty()) {
    Entry e = heap.top();
    heap.pop();
    if (toks[e.lpos] != e.lid || toks[e.rpos] != e.rid) continue;  // stale
    toks[e.lpos] = e.resid;
    toks[e.rpos] = -1;
    for (int k = e.lpos - 1; k >= 0; k--)
      if (toks[k] != -1) { tryadd(k, toks[k], e.lpos, e.resid); break; }
    for (int k = e.rpos + 1; k < n; k++)
      if (toks[k] != -1) { tryadd(e.lpos, e.resid, k, toks[k]); break; }
  }

  size_t m = 0;
  for (int t : toks) {
    if (t == -1) continue;
    if (m >= out_cap) return -1;
    out[m++] = t;
  }
  return (int)m;
}

}  // extern "C"
