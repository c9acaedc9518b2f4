// Standalone fp32 attention oracle (framework-free).
//
// Mirrors the semantics of the library's `attention_ref`
// (flash_attn_tpu/utils/testing.py, itself a port of the reference
// `tests/test_util.py:185`): bottom-right-aligned causal/local masking,
// GQA head grouping, ALiBi, softcap, per-batch used lengths, +inf LSE for
// fully-masked rows.  Multithreaded over (batch, head).

#include "flash_attn_ref.h"

#include <atomic>
#include <cmath>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

struct Task {
  const fa_ref_params* p;
  const float *q, *k, *v, *slopes;
  const int32_t *used_q, *used_k;
  float *out, *lse;
};

void compute_bh(const Task& t, int b, int h) {
  const fa_ref_params& p = *t.p;
  const int g = p.nheads / p.nheads_k;
  const int hk = h / g;
  const int sq = p.seqlen_q, sk = p.seqlen_k;
  const int d = p.head_dim, dv = p.head_dim_v;
  const int uq = t.used_q ? t.used_q[b] : sq;
  const int uk = t.used_k ? t.used_k[b] : sk;
  const int offset = uk - uq;  // bottom-right alignment
  const float slope = t.slopes ? t.slopes[(int64_t)b * p.nheads + h] : 0.f;

  // strides (row-major (b, s, h, d) / (b, s, hk, d))
  const int64_t qs = (int64_t)p.nheads * d;
  const int64_t ks = (int64_t)p.nheads_k * d;
  const int64_t vs = (int64_t)p.nheads_k * dv;
  const float* qb = t.q + ((int64_t)b * sq) * qs + (int64_t)h * d;
  const float* kb = t.k + ((int64_t)b * sk) * ks + (int64_t)hk * d;
  const float* vb = t.v + ((int64_t)b * sk) * vs + (int64_t)hk * dv;
  float* ob = t.out + ((int64_t)b * sq) * ((int64_t)p.nheads * dv)
              + (int64_t)h * dv;
  float* lb = t.lse + ((int64_t)b * p.nheads + h) * sq;

  std::vector<float> s(sk);
  for (int i = 0; i < sq; ++i) {
    const float* qi = qb + (int64_t)i * qs;
    float m = -std::numeric_limits<float>::infinity();
    for (int j = 0; j < sk; ++j) {
      bool masked = j >= uk || i >= uq;
      if (p.causal || p.window_right >= 0) {
        int wr = p.causal ? 0 : p.window_right;
        if (j > i + offset + wr) masked = true;
      }
      if (p.window_left >= 0 && j < i + offset - p.window_left) masked = true;
      if (masked) {
        s[j] = -std::numeric_limits<float>::infinity();
        continue;
      }
      const float* kj = kb + (int64_t)j * ks;
      float acc = 0.f;
      for (int c = 0; c < d; ++c) acc += qi[c] * kj[c];
      acc *= p.softmax_scale;
      if (p.softcap > 0.f) acc = std::tanh(acc / p.softcap) * p.softcap;
      if (t.slopes) acc -= slope * std::fabs((float)(i + offset - j));
      s[j] = acc;
      if (acc > m) m = acc;
    }
    float l = 0.f;
    for (int j = 0; j < sk; ++j) {
      if (std::isinf(s[j]) && s[j] < 0) { s[j] = 0.f; continue; }
      s[j] = std::exp(s[j] - m);
      l += s[j];
    }
    float* oi = ob + (int64_t)i * p.nheads * dv;
    if (l == 0.f) {  // fully-masked row: zero output, +inf LSE
      std::memset(oi, 0, sizeof(float) * dv);
      lb[i] = std::numeric_limits<float>::infinity();
      continue;
    }
    const float inv = 1.f / l;
    for (int c = 0; c < dv; ++c) oi[c] = 0.f;
    for (int j = 0; j < sk; ++j) {
      if (s[j] == 0.f) continue;
      const float w = s[j] * inv;
      const float* vj = vb + (int64_t)j * vs;
      for (int c = 0; c < dv; ++c) oi[c] += w * vj[c];
    }
    lb[i] = m + std::log(l);
  }
}

}  // namespace

extern "C" int fa_ref_attention(const fa_ref_params* p, const float* q,
                                const float* k, const float* v,
                                const float* alibi_slopes,
                                const int32_t* seqused_q,
                                const int32_t* seqused_k, float* out,
                                float* lse) {
  if (!p || !q || !k || !v || !out || !lse) return 1;
  if (p->nheads % p->nheads_k != 0) return 2;
  Task t{p, q, k, v, p->has_alibi ? alibi_slopes : nullptr,
         seqused_q, seqused_k, out, lse};
  const int total = p->batch * p->nheads;
  int nthreads = p->nthreads > 0
                     ? p->nthreads
                     : (int)std::thread::hardware_concurrency();
  if (nthreads < 1) nthreads = 1;
  if (nthreads > total) nthreads = total;

  std::atomic<int> next(0);
  auto worker = [&] {
    int idx;
    while ((idx = next.fetch_add(1)) < total)
      compute_bh(t, idx / p->nheads, idx % p->nheads);
  };
  std::vector<std::thread> pool;
  for (int i = 1; i < nthreads; ++i) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  return 0;
}

extern "C" float fa_ref_max_abs_diff(const float* a, const float* b,
                                     int64_t n) {
  float m = 0.f;
  for (int64_t i = 0; i < n; ++i) {
    const bool na = std::isnan(a[i]), nb = std::isnan(b[i]);
    if (na != nb) return std::numeric_limits<float>::infinity();
    if (na) continue;
    float d = std::fabs(a[i] - b[i]);
    if (std::isinf(a[i]) && std::isinf(b[i]) && ((a[i] > 0) == (b[i] > 0)))
      d = 0.f;
    if (d > m) m = d;
  }
  return m;
}
