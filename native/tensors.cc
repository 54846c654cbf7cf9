/* mmap'd safetensors container reader with strict validation.
 *
 * Native counterpart of the reference's src/tensors.c (mmap + hand-rolled
 * JSON header parser + hard-fail validation), re-designed for this
 * framework: C++ with a recursive-descent JSON parser restricted to the
 * safetensors schema, returning typed descriptors through the C API in
 * calm_native.h. The parse path also runs from memory (cn_tensors_parse)
 * so it can be fuzzed exactly like the reference's libFuzzer entry
 * (src/tensors.c:362-371, Makefile:60-61).
 */
#include "calm_native.h"

#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

thread_local std::string g_error;

void set_error(const std::string& msg) { g_error = msg; }

constexpr uint64_t kMaxHeader = 64ull << 20;
constexpr int kMaxDims = 8;

struct DType {
  const char* tag;
  int64_t itemsize;
};

const DType kDTypes[] = {
    {"F32", 4}, {"F16", 2}, {"BF16", 2}, {"F8_E5M2", 1}, {"F8_E4M3", 1},
    {"I32", 4}, {"I16", 2}, {"I8", 1},   {"U8", 1},
};

const DType* find_dtype(const std::string& tag) {
  for (const DType& d : kDTypes)
    if (tag == d.tag) return &d;
  return nullptr;
}

struct Tensor {
  std::string name;
  const DType* dtype = nullptr;
  int ndim = 0;
  int64_t shape[kMaxDims] = {0};
  uint64_t begin = 0, end = 0;  // absolute file offsets
};

// ---- minimal JSON parser (objects/arrays/strings/integers only — the
// safetensors header grammar; anything else is a hard parse error) ----

struct Parser {
  const char* p;
  const char* end;

  bool fail(const char* msg) {
    set_error(std::string("header JSON: ") + msg);
    return false;
  }
  void ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) p++;
  }
  bool expect(char c) {
    ws();
    if (p >= end || *p != c) return fail("unexpected character");
    p++;
    return true;
  }
  bool peek(char c) {
    ws();
    return p < end && *p == c;
  }
  // JSON string -> raw bytes. Supports the escapes the spec requires;
  // \uXXXX is decoded to UTF-8 (surrogate pairs included).
  bool string(std::string* out) {
    if (!expect('"')) return false;
    out->clear();
    while (p < end) {
      unsigned char c = *p++;
      if (c == '"') return true;
      if (c == '\\') {
        if (p >= end) return fail("truncated escape");
        char e = *p++;
        switch (e) {
          case '"': out->push_back('"'); break;
          case '\\': out->push_back('\\'); break;
          case '/': out->push_back('/'); break;
          case 'b': out->push_back('\b'); break;
          case 'f': out->push_back('\f'); break;
          case 'n': out->push_back('\n'); break;
          case 'r': out->push_back('\r'); break;
          case 't': out->push_back('\t'); break;
          case 'u': {
            uint32_t cp;
            if (!hex4(&cp)) return false;
            if (cp >= 0xD800 && cp <= 0xDBFF) {  // high surrogate
              if (p + 1 >= end || p[0] != '\\' || p[1] != 'u')
                return fail("unpaired surrogate");
              p += 2;
              uint32_t lo;
              if (!hex4(&lo)) return false;
              if (lo < 0xDC00 || lo > 0xDFFF) return fail("bad low surrogate");
              cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
            } else if (cp >= 0xDC00 && cp <= 0xDFFF) {
              return fail("unpaired surrogate");
            }
            append_utf8(out, cp);
            break;
          }
          default: return fail("unknown escape");
        }
      } else if (c < 0x20) {
        return fail("control character in string");
      } else {
        out->push_back((char)c);
      }
    }
    return fail("unterminated string");
  }
  bool hex4(uint32_t* out) {
    if (end - p < 4) return fail("truncated \\u escape");
    uint32_t v = 0;
    for (int i = 0; i < 4; i++) {
      char c = *p++;
      v <<= 4;
      if (c >= '0' && c <= '9') v |= (uint32_t)(c - '0');
      else if (c >= 'a' && c <= 'f') v |= (uint32_t)(c - 'a' + 10);
      else if (c >= 'A' && c <= 'F') v |= (uint32_t)(c - 'A' + 10);
      else return fail("bad hex digit");
    }
    *out = v;
    return true;
  }
  static void append_utf8(std::string* out, uint32_t cp) {
    if (cp < 0x80) {
      out->push_back((char)cp);
    } else if (cp < 0x800) {
      out->push_back((char)(0xC0 | (cp >> 6)));
      out->push_back((char)(0x80 | (cp & 0x3F)));
    } else if (cp < 0x10000) {
      out->push_back((char)(0xE0 | (cp >> 12)));
      out->push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
      out->push_back((char)(0x80 | (cp & 0x3F)));
    } else {
      out->push_back((char)(0xF0 | (cp >> 18)));
      out->push_back((char)(0x80 | ((cp >> 12) & 0x3F)));
      out->push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
      out->push_back((char)(0x80 | (cp & 0x3F)));
    }
  }
  // non-negative integer with overflow guard (shapes/offsets are >= 0)
  bool integer(int64_t* out) {
    ws();
    if (p >= end) return fail("truncated number");
    if (*p == '-') return fail("negative number");
    if (*p < '0' || *p > '9') return fail("expected number");
    int64_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') {
      int d = *p++ - '0';
      if (v > (INT64_MAX - d) / 10) return fail("number overflow");
      v = v * 10 + d;
    }
    *out = v;
    return true;
  }
};

}  // namespace

struct cn_tensors {
  // backing mmap (empty when parsed from caller-owned memory)
  void* map = nullptr;
  size_t map_size = 0;
  const uint8_t* data = nullptr;  // whole file
  size_t size = 0;

  std::vector<Tensor> tensors;
  std::unordered_map<std::string, int> index;
  std::vector<std::pair<std::string, std::string>> metadata;

  ~cn_tensors() {
    if (map) munmap(map, map_size);
  }
};

static bool parse_header(cn_tensors* t) {
  if (t->size < 8) return set_error("file too small"), false;
  uint64_t hsize;
  memcpy(&hsize, t->data, 8);  // little-endian hosts only (x86/arm)
  if (hsize > kMaxHeader || hsize > t->size - 8)
    return set_error("invalid header size"), false;
  const uint64_t data_size = t->size - 8 - hsize;

  Parser ps{(const char*)t->data + 8, (const char*)t->data + 8 + hsize};
  if (!ps.expect('{')) return false;
  if (ps.peek('}')) { ps.p++; return true; }

  std::string key, str;
  for (;;) {
    if (!ps.string(&key)) return false;
    if (!ps.expect(':')) return false;

    if (key == "__metadata__") {
      if (!ps.expect('{')) return false;
      if (!ps.peek('}')) {
        for (;;) {
          std::string mkey;
          if (!ps.string(&mkey)) return false;
          if (!ps.expect(':')) return false;
          if (!ps.string(&str)) return false;  // values must be strings
          t->metadata.emplace_back(mkey, str);
          if (ps.peek(',')) { ps.p++; continue; }
          break;
        }
      }
      if (!ps.expect('}')) return false;
    } else {
      Tensor tn;
      tn.name = key;
      bool have_dtype = false, have_shape = false, have_off = false;
      if (!ps.expect('{')) return false;
      for (;;) {
        std::string field;
        if (!ps.string(&field)) return false;
        if (!ps.expect(':')) return false;
        if (field == "dtype") {
          if (!ps.string(&str)) return false;
          tn.dtype = find_dtype(str);
          if (!tn.dtype) return set_error("unsupported dtype " + str), false;
          have_dtype = true;
        } else if (field == "shape") {
          if (!ps.expect('[')) return false;
          tn.ndim = 0;
          if (!ps.peek(']')) {
            for (;;) {
              if (tn.ndim >= kMaxDims) return set_error("too many dims"), false;
              if (!ps.integer(&tn.shape[tn.ndim])) return false;
              tn.ndim++;
              if (ps.peek(',')) { ps.p++; continue; }
              break;
            }
          }
          if (!ps.expect(']')) return false;
          have_shape = true;
        } else if (field == "data_offsets") {
          int64_t b, e;
          if (!ps.expect('[')) return false;
          if (!ps.integer(&b)) return false;
          if (!ps.expect(',')) return false;
          if (!ps.integer(&e)) return false;
          if (!ps.expect(']')) return false;
          tn.begin = (uint64_t)b;
          tn.end = (uint64_t)e;
          have_off = true;
        } else {
          return set_error("unknown tensor field " + field), false;
        }
        if (ps.peek(',')) { ps.p++; continue; }
        break;
      }
      if (!ps.expect('}')) return false;
      if (!have_dtype || !have_shape || !have_off)
        return set_error("tensor " + tn.name + ": missing field"), false;

      // element count with overflow guard (reference: src/tensors.c:97-112)
      int64_t n = 1;
      for (int i = 0; i < tn.ndim; i++) {
        int64_t d = tn.shape[i];
        if (d && n > INT64_MAX / d) return set_error("shape overflow"), false;
        n *= d;
      }
      if (tn.begin > tn.end || tn.end > data_size)
        return set_error("tensor " + tn.name + ": offsets out of range"), false;
      if (n > INT64_MAX / tn.dtype->itemsize ||
          (uint64_t)(n * tn.dtype->itemsize) != tn.end - tn.begin)
        return set_error("tensor " + tn.name + ": size mismatch"), false;

      tn.begin += 8 + hsize;
      tn.end += 8 + hsize;
      if (t->index.count(tn.name))
        return set_error("duplicate tensor " + tn.name), false;
      t->index[tn.name] = (int)t->tensors.size();
      t->tensors.push_back(std::move(tn));
    }

    if (ps.peek(',')) { ps.p++; continue; }
    break;
  }
  if (!ps.expect('}')) return false;
  ps.ws();
  // trailing bytes inside the declared header must be spaces (alignment pad)
  while (ps.p < ps.end)
    if (*ps.p++ != ' ') return set_error("garbage after header"), false;
  return true;
}

extern "C" {

const char* cn_last_error(void) { return g_error.c_str(); }

cn_tensors* cn_tensors_parse(const void* data, size_t size) {
  auto* t = new cn_tensors();
  t->data = (const uint8_t*)data;
  t->size = size;
  if (!parse_header(t)) {
    delete t;
    return nullptr;
  }
  return t;
}

cn_tensors* cn_tensors_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) {
    set_error(std::string("cannot open ") + path);
    return nullptr;
  }
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size <= 0) {
    close(fd);
    set_error("cannot stat file");
    return nullptr;
  }
  void* map = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (map == MAP_FAILED) {
    set_error("mmap failed");
    return nullptr;
  }
  // weights are consumed front to back at load: tell the kernel
  // (reference: src/tensors.c:285-296 posix_fadvise SEQUENTIAL)
  madvise(map, (size_t)st.st_size, MADV_SEQUENTIAL);

  cn_tensors* t = cn_tensors_parse(map, (size_t)st.st_size);
  if (!t) {
    munmap(map, (size_t)st.st_size);
    return nullptr;
  }
  t->map = map;
  t->map_size = (size_t)st.st_size;
  return t;
}

void cn_tensors_close(cn_tensors* t) { delete t; }

int cn_tensor_count(const cn_tensors* t) { return (int)t->tensors.size(); }

const char* cn_tensor_name(const cn_tensors* t, int i) {
  if (i < 0 || i >= (int)t->tensors.size()) return nullptr;
  return t->tensors[i].name.c_str();
}

int cn_tensor_info(const cn_tensors* t, const char* name,
                   const char** dtype_tag, int* ndim, int64_t* shape,
                   const void** data, int64_t* nbytes) {
  auto it = t->index.find(name);
  if (it == t->index.end()) {
    set_error(std::string("tensor not found: ") + name);
    return -1;
  }
  const Tensor& tn = t->tensors[it->second];
  if (dtype_tag) *dtype_tag = tn.dtype->tag;
  if (ndim) *ndim = tn.ndim;
  if (shape)
    for (int i = 0; i < tn.ndim; i++) shape[i] = tn.shape[i];
  if (data) *data = t->data + tn.begin;
  if (nbytes) *nbytes = (int64_t)(tn.end - tn.begin);
  return 0;
}

int cn_metadata_count(const cn_tensors* t) { return (int)t->metadata.size(); }

const char* cn_metadata_key(const cn_tensors* t, int i) {
  if (i < 0 || i >= (int)t->metadata.size()) return nullptr;
  return t->metadata[i].first.c_str();
}

const char* cn_metadata_find(const cn_tensors* t, const char* key) {
  for (const auto& kv : t->metadata)
    if (kv.first == key) return kv.second.c_str();
  return nullptr;
}

}  // extern "C"
