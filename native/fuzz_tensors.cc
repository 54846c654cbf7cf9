/* Fuzz harness for the container parser — the only component that consumes
 * untrusted bytes (same reasoning as the reference, which fuzzes exactly
 * src/tensors.c via libFuzzer: tensors.c:362-371, Makefile:60-61).
 *
 * Two build modes:
 *   clang -fsanitize=fuzzer,address          -> libFuzzer in-process fuzzing
 *   g++ -DSTANDALONE_FUZZ (+ optional ASan)  -> deterministic self-driving
 *     mutation loop: seeds a valid container, then flips/splices bytes with
 *     xorshift64* for N rounds. Used by `make fuzz-smoke` and the test
 *     suite, so the parser gets adversarial coverage even without clang.
 */
#include "calm_native.h"

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

static void fuzz_tokenizer(const uint8_t* data, size_t size) {
  // split the input: first half = pieces blob, second half = text to encode
  if (size < 8) return;
  size_t half = size / 2;
  std::vector<uint8_t> blob(data, data + half);
  if (blob.empty() || blob.back() != 0) blob.push_back(0);
  // count pieces and try both the true count and off-by-one counts
  int n = 0;
  for (uint8_t b : blob)
    if (b == 0) n++;
  std::vector<float> scores((size_t)n + 2, 0.5f);
  for (int vocab : {n, n - 1, n + 1}) {
    if (vocab <= 0) continue;
    cn_tokenizer* tk = cn_tokenizer_create(blob.data(), blob.size(),
                                           scores.data(), vocab, 1);
    if (!tk) continue;
    std::vector<int> out(size - half + 3);
    cn_tokenizer_encode(tk, data + half, size - half, 1, out.data(),
                        out.size());
    cn_tokenizer_free(tk);
  }
}

extern "C" int LLVMFuzzerTestOneInput(const uint8_t* data, size_t size) {
  fuzz_tokenizer(data, size);
  cn_tensors* t = cn_tensors_parse(data, size);
  if (t) {
    // exercise the accessor surface on accepted inputs
    int n = cn_tensor_count(t);
    for (int i = 0; i < n; i++) {
      const char* name = cn_tensor_name(t, i);
      const char* tag;
      int ndim;
      int64_t shape[8], nbytes;
      const void* ptr;
      cn_tensor_info(t, name, &tag, &ndim, shape, &ptr, &nbytes);
      // touch first/last byte of each tensor: offsets must be in bounds
      if (nbytes > 0) {
        volatile uint8_t a = ((const uint8_t*)ptr)[0];
        volatile uint8_t b = ((const uint8_t*)ptr)[nbytes - 1];
        (void)a; (void)b;
      }
    }
    for (int i = 0; i < cn_metadata_count(t); i++)
      cn_metadata_find(t, cn_metadata_key(t, i));
    cn_tensors_close(t);
  }
  return 0;
}

#ifdef STANDALONE_FUZZ
static uint64_t g_state = 0x853c49e6748fea9bull;

static std::string make_seed() {
  // a small valid container: metadata + one tensor
  const char* hdr =
      "{\"__metadata__\":{\"arch\":\"llama\",\"dtype\":\"fp8\"},"
      "\"model.norm.weight\":{\"dtype\":\"F32\",\"shape\":[4],"
      "\"data_offsets\":[0,16]}}";
  std::string s;
  uint64_t hl = strlen(hdr);
  s.append((const char*)&hl, 8);
  s.append(hdr);
  s.append(16, '\x42');
  return s;
}

int main(int argc, char** argv) {
  long rounds = argc > 1 ? atol(argv[1]) : 200000;
  std::string seed = make_seed();

  // the seed itself must parse
  cn_tensors* t = cn_tensors_parse(seed.data(), seed.size());
  if (!t) {
    fprintf(stderr, "seed rejected: %s\n", cn_last_error());
    return 1;
  }
  cn_tensors_close(t);

  std::vector<uint8_t> buf;
  for (long r = 0; r < rounds; r++) {
    buf.assign(seed.begin(), seed.end());
    // 1-8 random byte mutations; occasionally truncate or extend
    int muts = 1 + (int)(cn_rand64(&g_state) % 8);
    for (int m = 0; m < muts; m++) {
      uint64_t roll = cn_rand64(&g_state);
      size_t pos = buf.empty() ? 0 : (size_t)(roll % buf.size());
      switch ((roll >> 56) % 5) {
        case 0: buf[pos] = (uint8_t)(roll >> 8); break;          // flip
        case 1: buf.resize(pos); break;                           // truncate
        case 2: buf.insert(buf.begin() + pos, (uint8_t)roll); break;
        case 3: if (!buf.empty()) buf.erase(buf.begin() + pos); break;
        case 4: buf[pos] ^= (uint8_t)(1u << (roll % 8)); break;  // bitflip
      }
    }
    LLVMFuzzerTestOneInput(buf.data(), buf.size());
  }
  printf("fuzz-smoke: %ld rounds, no crash\n", rounds);
  return 0;
}
#endif
