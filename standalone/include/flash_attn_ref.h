/* C API of the standalone attention reference oracle.
 *
 * TPU-native counterpart of the reference's PyTorch-free FA3 harness C API
 * (`standalone/include/flash_api.h`, 249 LoC).  On GPU the standalone
 * harness re-runs the CUDA kernels without torch; on TPU the kernels only
 * exist inside an XLA program, so the framework-free component is the
 * *oracle*: an exact fp32 attention used to validate kernel IO dumps from
 * any build (two-build diff, input consistency check — the roles of
 * `standalone/scripts/check_input_data.cu` and `compare_kernels.py`).
 */
#ifndef FLASH_ATTN_REF_H_
#define FLASH_ATTN_REF_H_

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct {
  int32_t batch;
  int32_t nheads;      /* query heads */
  int32_t nheads_k;    /* kv heads (GQA: nheads % nheads_k == 0) */
  int32_t seqlen_q;
  int32_t seqlen_k;
  int32_t head_dim;    /* qk head dim */
  int32_t head_dim_v;  /* v / output head dim (MLA: may differ) */
  int32_t causal;      /* bottom-right aligned, reference mask.h semantics */
  int32_t window_left;  /* -1 = unlimited */
  int32_t window_right; /* -1 = unlimited */
  float softmax_scale;
  float softcap;        /* 0 = off */
  int32_t has_alibi;    /* alibi_slopes: (batch, nheads) f32, or NULL */
  int32_t nthreads;     /* 0 = hardware_concurrency */
} fa_ref_params;

/* Compute o (b, sq, h, dv) and lse (b, h, sq) in fp32.
 * Layouts match the library: q (b, sq, h, d), k (b, sk, hk, d),
 * v (b, sk, hk, dv), all row-major fp32.  Returns 0 on success. */
int fa_ref_attention(const fa_ref_params* p,
                     const float* q, const float* k, const float* v,
                     const float* alibi_slopes,
                     const int32_t* seqused_q,  /* (b,) or NULL */
                     const int32_t* seqused_k,  /* (b,) or NULL */
                     float* out, float* lse);

/* max |a-b| over n elements (NaN-poisoning: returns INFINITY if either
 * array holds a NaN where the other does not). */
float fa_ref_max_abs_diff(const float* a, const float* b, int64_t n);

#ifdef __cplusplus
}
#endif

#endif /* FLASH_ATTN_REF_H_ */
