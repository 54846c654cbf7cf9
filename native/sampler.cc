/* Host-side sampling: greedy argmax and min-p cutoff sampling.
 *
 * Native counterpart of the reference sampler (src/sampler.c): xorshift64*
 * RNG, min-p cutoff applied in logit space (exp(l/T) <= exp(max/T)*minp
 * <=> l <= max + log(minp)*T, src/sampler.c:44-78), greedy first-max-wins
 * argmax. Bit-compatible with the Python sampler (calm_tpu/sampler.py) so
 * either can serve the decode loop with identical draws.
 */
#include "calm_native.h"

#include <cmath>

extern "C" {

uint64_t cn_rand64(uint64_t* state) {
  uint64_t s = *state;
  s ^= s >> 12;
  s ^= s << 25;
  s ^= s >> 27;
  *state = s;
  return s * 0x2545F4914F6CDD1Dull;
}

int cn_sample_argmax(const float* logits, int n) {
  int best = 0;
  for (int i = 1; i < n; i++)
    if (logits[i] > logits[best]) best = i;
  return best;
}

int cn_sample_minp(const float* logits, int n, float temperature, float minp,
                   uint64_t* state) {
  if (n <= 0) return -1;
  if (temperature == 0.0f || minp >= 1.0f) return cn_sample_argmax(logits, n);

  float max_logit = logits[0];
  for (int i = 1; i < n; i++)
    if (logits[i] > max_logit) max_logit = logits[i];
  const float cutoff = max_logit + logf(minp) * temperature;

  // one pass computes survivor probabilities and their sum (f32 sum in
  // index order, matching the Python/numpy reference accumulation)
  float cumulative = 0.0f;
  int last_keep = -1;
  for (int i = 0; i < n; i++) {
    if (logits[i] >= cutoff) {
      cumulative += expf((logits[i] - max_logit) / temperature);
      last_keep = i;
    }
  }

  const float coin =
      (float)((uint32_t)(cn_rand64(state) >> 32) >> 8) / 16777216.0f;
  const float r = coin * cumulative;

  float cdf = 0.0f;
  for (int i = 0; i < n; i++) {
    if (logits[i] < cutoff) continue;
    cdf += expf((logits[i] - max_logit) / temperature);
    if (r < cdf) return i;
  }
  return last_keep;  // rounding-error fallback (reference behavior)
}

}  // extern "C"
