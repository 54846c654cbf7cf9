/* C API of the calm-tpu native runtime layer.
 *
 * Native counterparts of the reference's C core, rebuilt for the TPU
 * framework's host side (reference: src/tensors.{h,c} - mmap'd safetensors
 * reader; src/tokenizer.{h,c} - heap-merge byte BPE; src/sampler.{h,c} -
 * argmax + min-p). The TPU compute path stays in JAX/XLA/Pallas; this layer
 * services the host: container validation/IO, prompt tokenization for the
 * serving loop, host-side sampling.
 *
 * Exposed through ctypes (calm_tpu/native.py); every entry point is
 * extern "C" with plain-C types only.
 */
#ifndef CALM_NATIVE_H
#define CALM_NATIVE_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---- container: mmap'd safetensors reader ---- */

typedef struct cn_tensors cn_tensors;

/* Open and fully validate a .calm/.safetensors file. Returns NULL on any
 * validation failure; cn_last_error() then holds a message. */
cn_tensors* cn_tensors_open(const char* path);

/* Parse an in-memory buffer (no mmap). Used by the fuzzer and for tests.
 * The buffer must outlive the handle. */
cn_tensors* cn_tensors_parse(const void* data, size_t size);

void cn_tensors_close(cn_tensors* t);

const char* cn_last_error(void);

int         cn_tensor_count(const cn_tensors* t);
const char* cn_tensor_name(const cn_tensors* t, int i);

/* Look up a tensor; returns 0 on success. dtype_tag receives the
 * safetensors tag (e.g. "F16"); shape must have room for 8 dims. */
int cn_tensor_info(const cn_tensors* t, const char* name,
                   const char** dtype_tag, int* ndim, int64_t* shape,
                   const void** data, int64_t* nbytes);

int         cn_metadata_count(const cn_tensors* t);
const char* cn_metadata_key(const cn_tensors* t, int i);
const char* cn_metadata_find(const cn_tensors* t, const char* key);

/* ---- tokenizer: byte-level BPE with heap merges ---- */

typedef struct cn_tokenizer cn_tokenizer;

/* pieces_blob: vocab_size NUL-terminated byte strings back to back
 * (the container's tokenizer.tokens payload); scores: one float each. */
cn_tokenizer* cn_tokenizer_create(const uint8_t* pieces_blob, size_t blob_len,
                                  const float* scores, int vocab_size,
                                  int bos_id);
void cn_tokenizer_free(cn_tokenizer* tk);

/* Encode UTF-8 bytes into token ids. out must hold len + 3 entries
 * (tokenizer_bound). Returns the token count, or -1 on error. */
int cn_tokenizer_encode(const cn_tokenizer* tk, const uint8_t* text,
                        size_t len, int add_bos, int* out, size_t out_cap);

/* Find the id of an exact piece, -1 if absent. */
int cn_tokenizer_find(const cn_tokenizer* tk, const uint8_t* piece, size_t len);

/* ---- sampler: argmax + min-p in logit space ---- */

/* Greedy argmax over n logits. */
int cn_sample_argmax(const float* logits, int n);

/* Min-p sampling (reference: src/sampler.c:44-78): cutoff in logit space at
 * max_logit + log(minp)*temperature, softmax over survivors, one draw from
 * the xorshift64* stream in *state. */
int cn_sample_minp(const float* logits, int n, float temperature, float minp,
                   uint64_t* state);

/* xorshift64* step, exposed so hosts can share the RNG stream. */
uint64_t cn_rand64(uint64_t* state);

#ifdef __cplusplus
}
#endif

#endif /* CALM_NATIVE_H */
