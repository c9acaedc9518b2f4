// Standalone CLI: validate kernel IO dumps against the C++ oracle.
//
// TPU counterpart of the reference standalone harness CLI
// (`standalone/src/main.cpp`, 394 LoC) and its debug scripts: `info` is the
// param dumper (`debug_print_params.cu` role), `check` is the consistency
// checker (`scripts/check_input_data.cu` role), `run` + `diff` give the
// two-build output diff (`scripts/compare_kernels.py` role), `selftest`
// holds the scenario tests (`src/test_fp16_causal_gqa.cpp` etc.).
//
// Dump format (little-endian), produced by
// flash_attn_tpu/utils/standalone_io.py:
//   magic "FATPU1\0\0"
//   int32 x 12: b, h, hk, sq, sk, d, dv, causal, window_l, window_r,
//               has_alibi, flags (bit0: seqused_q, bit1: seqused_k)
//   f32 x 2: softmax_scale, softcap
//   f32 arrays: q, k, v, [alibi_slopes], [seqused_q i32], [seqused_k i32],
//               o, lse

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "flash_attn_ref.h"

namespace {

struct Dump {
  fa_ref_params p{};
  std::vector<float> q, k, v, slopes, o, lse;
  std::vector<int32_t> used_q, used_k;
};

bool read_exact(FILE* f, void* dst, size_t n) {
  return std::fread(dst, 1, n, f) == n;
}

bool load(const char* path, Dump* d) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path); return false; }
  char magic[8];
  if (!read_exact(f, magic, 8) || std::memcmp(magic, "FATPU1\0\0", 8) != 0) {
    std::fprintf(stderr, "bad magic\n"); std::fclose(f); return false;
  }
  int32_t hdr[12];
  float fhdr[2];
  if (!read_exact(f, hdr, sizeof hdr) || !read_exact(f, fhdr, sizeof fhdr)) {
    std::fclose(f); return false;
  }
  fa_ref_params& p = d->p;
  p.batch = hdr[0]; p.nheads = hdr[1]; p.nheads_k = hdr[2];
  p.seqlen_q = hdr[3]; p.seqlen_k = hdr[4];
  p.head_dim = hdr[5]; p.head_dim_v = hdr[6];
  p.causal = hdr[7]; p.window_left = hdr[8]; p.window_right = hdr[9];
  p.has_alibi = hdr[10];
  const int flags = hdr[11];
  p.softmax_scale = fhdr[0]; p.softcap = fhdr[1];

  auto rd = [&](std::vector<float>& v_, int64_t n) {
    v_.resize(n);
    return read_exact(f, v_.data(), n * sizeof(float));
  };
  const int64_t b = p.batch, h = p.nheads, hk = p.nheads_k;
  const int64_t sq = p.seqlen_q, sk = p.seqlen_k, dd = p.head_dim,
                dv = p.head_dim_v;
  bool ok = rd(d->q, b * sq * h * dd) && rd(d->k, b * sk * hk * dd) &&
            rd(d->v, b * sk * hk * dv);
  if (ok && p.has_alibi) ok = rd(d->slopes, b * h);
  if (ok && (flags & 1)) {
    d->used_q.resize(b);
    ok = read_exact(f, d->used_q.data(), b * sizeof(int32_t));
  }
  if (ok && (flags & 2)) {
    d->used_k.resize(b);
    ok = read_exact(f, d->used_k.data(), b * sizeof(int32_t));
  }
  if (ok) ok = rd(d->o, b * sq * h * dv) && rd(d->lse, b * h * sq);
  std::fclose(f);
  if (!ok) std::fprintf(stderr, "truncated dump\n");
  return ok;
}

void info(const Dump& d) {
  const fa_ref_params& p = d.p;
  std::printf(
      "b=%d h=%d hk=%d sq=%d sk=%d d=%d dv=%d causal=%d window=(%d,%d) "
      "scale=%g softcap=%g alibi=%d used_q=%s used_k=%s\n",
      p.batch, p.nheads, p.nheads_k, p.seqlen_q, p.seqlen_k, p.head_dim,
      p.head_dim_v, p.causal, p.window_left, p.window_right,
      (double)p.softmax_scale, (double)p.softcap, p.has_alibi,
      d.used_q.empty() ? "-" : "yes", d.used_k.empty() ? "-" : "yes");
}

int recompute(const Dump& d, std::vector<float>* o, std::vector<float>* lse) {
  const fa_ref_params& p = d.p;
  o->assign((int64_t)p.batch * p.seqlen_q * p.nheads * p.head_dim_v, 0.f);
  lse->assign((int64_t)p.batch * p.nheads * p.seqlen_q, 0.f);
  return fa_ref_attention(
      &p, d.q.data(), d.k.data(), d.v.data(),
      d.slopes.empty() ? nullptr : d.slopes.data(),
      d.used_q.empty() ? nullptr : d.used_q.data(),
      d.used_k.empty() ? nullptr : d.used_k.data(), o->data(), lse->data());
}

int cmd_check(const char* path, float tol_o, float tol_lse) {
  Dump d;
  if (!load(path, &d)) return 2;
  info(d);
  std::vector<float> o, lse;
  if (recompute(d, &o, &lse) != 0) return 2;
  const float eo = fa_ref_max_abs_diff(o.data(), d.o.data(), (int64_t)o.size());
  const float el =
      fa_ref_max_abs_diff(lse.data(), d.lse.data(), (int64_t)lse.size());
  std::printf("max|o - oracle| = %.6g (tol %.3g)\n", (double)eo, (double)tol_o);
  std::printf("max|lse - oracle| = %.6g (tol %.3g)\n", (double)el,
              (double)tol_lse);
  const bool pass = eo <= tol_o && el <= tol_lse;
  std::printf("%s\n", pass ? "CHECK PASS" : "CHECK FAIL");
  return pass ? 0 : 1;
}

int cmd_diff(const char* a_path, const char* b_path) {
  Dump a, b;
  if (!load(a_path, &a) || !load(b_path, &b)) return 2;
  if (a.o.size() != b.o.size() || a.lse.size() != b.lse.size()) {
    std::fprintf(stderr, "shape mismatch\n");
    return 2;
  }
  std::printf("max|o_a - o_b| = %.6g\n",
              (double)fa_ref_max_abs_diff(a.o.data(), b.o.data(),
                                          (int64_t)a.o.size()));
  std::printf("max|lse_a - lse_b| = %.6g\n",
              (double)fa_ref_max_abs_diff(a.lse.data(), b.lse.data(),
                                          (int64_t)a.lse.size()));
  return 0;
}

// --------------------------- scenario selftests ---------------------------

float lcg_unit(uint64_t* s) {  // deterministic inputs, no libc rand
  *s = *s * 6364136223846793005ULL + 1442695040888963407ULL;
  return (float)((*s >> 33) & 0xFFFFFF) / (float)0x1000000 - 0.5f;
}

// e4m3fn (1s/4e bias-7/3m, max 448, no inf) round-trip through the nearest
// representable value — the quantisation grid of the FP8 paths (role of the
// reference's fp8-varlen scenario, `standalone/src/test_fp8_varlen.cpp`).
float e4m3_roundtrip(float x) {
  if (x != x) return x;
  float ax = std::fabs(x);
  const float sign = x < 0.f ? -1.f : 1.f;
  if (ax > 448.f) return sign * 448.f;           // saturating (fn variant)
  if (ax < 0.5f * 0.001953125f) return sign * 0.f;  // < half min subnormal
  int e;
  std::frexp(ax, &e);            // ax = m * 2^e, m in [0.5, 1)
  // quantum: 2^(e-1-3) for normals (3 mantissa bits), floor at 2^-9
  int qexp = e - 1 - 3;
  if (qexp < -9) qexp = -9;      // subnormal grid (min normal 2^-6)
  const float quantum = std::ldexp(1.f, qexp);
  float r = std::nearbyint(ax / quantum) * quantum;  // RNE (default mode)
  if (r > 448.f) r = 448.f;
  return sign * r;
}

// Decode-GQA scenario (`standalone/src/test_fp16_decode_gqa.cpp` role):
// short q against a long ragged cache, GQA 8/2, validated through the
// split-KV combine identity — attention over the full key range must equal
// the LSE-weighted merge of two disjoint half-range computations
// (`flash_fwd_combine_kernel.h` math).
int selftest_decode_gqa() {
  fa_ref_params p{};
  p.batch = 3; p.nheads = 8; p.nheads_k = 2;
  p.seqlen_q = 1; p.seqlen_k = 160;
  p.head_dim = 32; p.head_dim_v = 32;
  p.causal = 1; p.window_left = -1; p.window_right = -1;
  p.softmax_scale = 1.f / std::sqrt((float)p.head_dim);
  p.nthreads = 2;

  const int64_t nq = (int64_t)p.batch * p.seqlen_q * p.nheads * p.head_dim;
  const int64_t nk = (int64_t)p.batch * p.seqlen_k * p.nheads_k * p.head_dim;
  const int64_t no = (int64_t)p.batch * p.seqlen_q * p.nheads * p.head_dim_v;
  const int64_t nl = (int64_t)p.batch * p.nheads * p.seqlen_q;
  std::vector<float> q(nq), k(nk), v(nk), o_full(no), l_full(nl);
  uint64_t seed = 7;
  for (auto& x : q) x = lcg_unit(&seed);
  for (auto& x : k) x = lcg_unit(&seed);
  for (auto& x : v) x = lcg_unit(&seed);
  std::vector<int32_t> used = {160, 97, 64};  // ragged cache lengths

  if (fa_ref_attention(&p, q.data(), k.data(), v.data(), nullptr, nullptr,
                       used.data(), o_full.data(), l_full.data()) != 0) {
    std::printf("FAIL: decode-gqa oracle error\n");
    return 1;
  }

  // split at key 64: range A = [0, 64), range B = [64, used)
  const int split = 64;
  const int64_t krow = (int64_t)p.nheads_k * p.head_dim;
  std::vector<float> oa(no), la(nl), ob(no), lb(nl);
  fa_ref_params pa = p;
  pa.seqlen_k = split;
  pa.causal = 0;  // split ranges: causal bound handled by range choice
  std::vector<int32_t> ua(p.batch), ub(p.batch);
  for (int b = 0; b < p.batch; ++b) {
    ua[b] = used[b] < split ? used[b] : split;
    ub[b] = used[b] > split ? used[b] - split : 0;
  }
  // copy range A per batch (the oracle's batch stride is seqlen_k rows)
  std::vector<float> ka((int64_t)p.batch * split * krow);
  std::vector<float> va((int64_t)p.batch * split * krow);
  for (int b = 0; b < p.batch; ++b) {
    std::memcpy(ka.data() + (int64_t)b * split * krow,
                k.data() + (int64_t)b * p.seqlen_k * krow,
                sizeof(float) * split * krow);
    std::memcpy(va.data() + (int64_t)b * split * krow,
                v.data() + (int64_t)b * p.seqlen_k * krow,
                sizeof(float) * split * krow);
  }
  fa_ref_attention(&pa, q.data(), ka.data(), va.data(), nullptr, nullptr,
                   ua.data(), oa.data(), la.data());
  // range B: shift each batch's keys down by `split` rows
  const int skb = p.seqlen_k - split;
  std::vector<float> kb((int64_t)p.batch * skb * krow);
  std::vector<float> vb((int64_t)p.batch * skb * krow);
  for (int b = 0; b < p.batch; ++b) {
    std::memcpy(kb.data() + (int64_t)b * skb * krow,
                k.data() + ((int64_t)b * p.seqlen_k + split) * krow,
                sizeof(float) * skb * krow);
    std::memcpy(vb.data() + (int64_t)b * skb * krow,
                v.data() + ((int64_t)b * p.seqlen_k + split) * krow,
                sizeof(float) * skb * krow);
  }
  fa_ref_params pb = p;
  pb.seqlen_k = skb;
  pb.causal = 0;
  fa_ref_attention(&pb, q.data(), kb.data(), vb.data(), nullptr, nullptr,
                   ub.data(), ob.data(), lb.data());

  // LSE-weighted merge (+inf = empty split contributes nothing)
  float max_do = 0.f, max_dl = 0.f;
  for (int b = 0; b < p.batch; ++b)
    for (int h = 0; h < p.nheads; ++h) {
      const int64_t li = ((int64_t)b * p.nheads + h) * p.seqlen_q;
      const float la_ = std::isinf(la[li]) ? -INFINITY : la[li];
      const float lb_ = std::isinf(lb[li]) ? -INFINITY : lb[li];
      const float m = la_ > lb_ ? la_ : lb_;
      const float wa = std::exp(la_ - m), wb = std::exp(lb_ - m);
      const float lse = m + std::log(wa + wb);
      float dl = std::fabs(lse - l_full[li]);
      if (dl > max_dl) max_dl = dl;
      const int64_t oi =
          (((int64_t)b * p.seqlen_q) * p.nheads + h) * p.head_dim_v;
      for (int c = 0; c < p.head_dim_v; ++c) {
        const float merged =
            (oa[oi + c] * wa + ob[oi + c] * wb) / (wa + wb);
        float d = std::fabs(merged - o_full[oi + c]);
        if (d > max_do) max_do = d;
      }
    }
  if (max_do > 1e-5f || max_dl > 1e-5f) {
    std::printf("FAIL: decode-gqa split-combine mismatch (dO %g, dLSE %g)\n",
                (double)max_do, (double)max_dl);
    return 1;
  }
  std::printf("decode-gqa scenario OK (split-combine dO %.2e)\n",
              (double)max_do);
  return 0;
}

// FP8-varlen scenario (`standalone/src/test_fp8_varlen.cpp` role): ragged
// lengths, q/k/v quantised to the e4m3 grid with per-(seq, kv-head) descale,
// validated against the fp32 oracle at the fp8 accuracy gate.
int selftest_fp8_varlen() {
  fa_ref_params p{};
  p.batch = 3; p.nheads = 4; p.nheads_k = 2;
  p.seqlen_q = 48; p.seqlen_k = 48;
  p.head_dim = 32; p.head_dim_v = 32;
  p.causal = 1; p.window_left = -1; p.window_right = -1;
  p.softmax_scale = 1.f / std::sqrt((float)p.head_dim);
  p.nthreads = 2;

  const int64_t nq = (int64_t)p.batch * p.seqlen_q * p.nheads * p.head_dim;
  const int64_t nk = (int64_t)p.batch * p.seqlen_k * p.nheads_k * p.head_dim;
  const int64_t no = (int64_t)p.batch * p.seqlen_q * p.nheads * p.head_dim_v;
  const int64_t nl = (int64_t)p.batch * p.nheads * p.seqlen_q;
  std::vector<float> q(nq), k(nk), v(nk), o_ref(no), l_ref(nl);
  std::vector<float> o8(no), l8(nl);
  uint64_t seed = 11;
  for (auto& x : q) x = lcg_unit(&seed) * 3.f;
  for (auto& x : k) x = lcg_unit(&seed) * 3.f;
  for (auto& x : v) x = lcg_unit(&seed) * 3.f;
  std::vector<int32_t> used_q = {48, 31, 17};   // ragged (varlen role)
  std::vector<int32_t> used_k = {48, 31, 17};

  fa_ref_attention(&p, q.data(), k.data(), v.data(), nullptr,
                   used_q.data(), used_k.data(), o_ref.data(), l_ref.data());

  // per-(batch, kv-head) amax scaling to the e4m3 range, then round-trip
  // through the grid — exactly what the TPU fp8 path's descale models
  auto quantize = [&](std::vector<float>& x, int sl, int nh, int hd) {
    for (int b = 0; b < p.batch; ++b)
      for (int h = 0; h < nh; ++h) {
        float amax = 1e-12f;
        for (int s = 0; s < sl; ++s)
          for (int c = 0; c < hd; ++c) {
            const int64_t i = (((int64_t)b * sl + s) * nh + h) * hd + c;
            const float a = std::fabs(x[i]);
            if (a > amax) amax = a;
          }
        const float scale = 448.f / amax;
        for (int s = 0; s < sl; ++s)
          for (int c = 0; c < hd; ++c) {
            const int64_t i = (((int64_t)b * sl + s) * nh + h) * hd + c;
            x[i] = e4m3_roundtrip(x[i] * scale) / scale;
          }
      }
  };
  std::vector<float> q8 = q, k8 = k, v8 = v;
  quantize(q8, p.seqlen_q, p.nheads, p.head_dim);
  quantize(k8, p.seqlen_k, p.nheads_k, p.head_dim);
  quantize(v8, p.seqlen_k, p.nheads_k, p.head_dim_v);

  fa_ref_attention(&p, q8.data(), k8.data(), v8.data(), nullptr,
                   used_q.data(), used_k.data(), o8.data(), l8.data());

  // fp8 gate: quantisation error of the inputs bounds the output error;
  // e4m3's half-ulp is 2^-4 relative, amplified ~sqrt(d) through the
  // dot + softmax -> ~1e-1 on these magnitudes (measured 7e-2)
  float max_d = 0.f;
  for (int b = 0; b < p.batch; ++b)
    for (int i = 0; i < used_q[b]; ++i) {
      const int64_t off =
          (((int64_t)b * p.seqlen_q + i) * p.nheads) * p.head_dim_v;
      const int64_t n = (int64_t)p.nheads * p.head_dim_v;
      float d = fa_ref_max_abs_diff(o_ref.data() + off, o8.data() + off, n);
      if (d > max_d) max_d = d;
    }
  if (max_d > 1e-1f) {
    std::printf("FAIL: fp8-varlen outside gate (dO %g)\n", (double)max_d);
    return 1;
  }
  std::printf("fp8-varlen scenario OK (dO %.2e vs fp32 oracle)\n",
              (double)max_d);
  return 0;
}

int selftest() {
  int failures = 0;
  // scenario: causal GQA with MLA head dims + sliding window
  fa_ref_params p{};
  p.batch = 2; p.nheads = 4; p.nheads_k = 2;
  p.seqlen_q = 33; p.seqlen_k = 47;
  p.head_dim = 24; p.head_dim_v = 16;
  p.causal = 1; p.window_left = -1; p.window_right = -1;
  p.softmax_scale = 1.f / std::sqrt((float)p.head_dim);
  p.nthreads = 4;

  const int64_t nq = (int64_t)p.batch * p.seqlen_q * p.nheads * p.head_dim;
  const int64_t nk = (int64_t)p.batch * p.seqlen_k * p.nheads_k * p.head_dim;
  const int64_t nv = (int64_t)p.batch * p.seqlen_k * p.nheads_k * p.head_dim_v;
  const int64_t no = (int64_t)p.batch * p.seqlen_q * p.nheads * p.head_dim_v;
  const int64_t nl = (int64_t)p.batch * p.nheads * p.seqlen_q;
  std::vector<float> q(nq), k(nk), v(nv), o1(no), l1(nl), o2(no), l2(nl);
  uint64_t seed = 42;
  for (auto& x : q) x = lcg_unit(&seed);
  for (auto& x : k) x = lcg_unit(&seed);
  for (auto& x : v) x = lcg_unit(&seed);

  if (fa_ref_attention(&p, q.data(), k.data(), v.data(), nullptr, nullptr,
                       nullptr, o1.data(), l1.data()) != 0) {
    std::printf("selftest: oracle returned error\n");
    return 1;
  }

  // determinism across thread counts (the race-condition test role,
  // reference tests/test_flash_attn.py:2199)
  p.nthreads = 1;
  fa_ref_attention(&p, q.data(), k.data(), v.data(), nullptr, nullptr,
                   nullptr, o2.data(), l2.data());
  if (fa_ref_max_abs_diff(o1.data(), o2.data(), no) != 0.f) {
    std::printf("FAIL: not deterministic across thread counts\n");
    ++failures;
  }

  // causality: perturbing K/V beyond the last causal column must leave
  // earlier rows unchanged (the CausalityMonitor check,
  // training/src/callbacks/causality_monitor.py)
  std::vector<float> k2 = k, v2 = v;
  const int offset = p.seqlen_k - p.seqlen_q;
  const int cut = offset + 20;  // columns > row 19's reach
  for (int b = 0; b < p.batch; ++b)
    for (int j = cut + 1; j < p.seqlen_k; ++j)
      for (int hh = 0; hh < p.nheads_k; ++hh)
        for (int c = 0; c < p.head_dim; ++c) {
          const int64_t idx =
              (((int64_t)b * p.seqlen_k + j) * p.nheads_k + hh) * p.head_dim + c;
          k2[idx] += 7.f;
        }
  p.nthreads = 4;
  fa_ref_attention(&p, q.data(), k2.data(), v2.data(), nullptr, nullptr,
                   nullptr, o2.data(), l2.data());
  // rows 0..19 unchanged
  const int64_t row_sz = (int64_t)p.nheads * p.head_dim_v;
  float max_past = 0.f;
  for (int b = 0; b < p.batch; ++b)
    for (int i = 0; i <= 19; ++i) {
      const int64_t off = ((int64_t)b * p.seqlen_q + i) * row_sz;
      float d = fa_ref_max_abs_diff(o1.data() + off, o2.data() + off, row_sz);
      if (d > max_past) max_past = d;
    }
  if (max_past != 0.f) {
    std::printf("FAIL: causality violated (past rows changed by %g)\n",
                (double)max_past);
    ++failures;
  }

  // fully-masked rows: seqused_k = 0 -> zero output, +inf LSE
  std::vector<int32_t> uk(p.batch, 0);
  fa_ref_attention(&p, q.data(), k.data(), v.data(), nullptr, nullptr,
                   uk.data(), o2.data(), l2.data());
  for (int64_t i = 0; i < no; ++i)
    if (o2[i] != 0.f) { std::printf("FAIL: masked row nonzero\n");
                        ++failures; break; }
  for (int64_t i = 0; i < nl; ++i)
    if (!std::isinf(l2[i])) { std::printf("FAIL: masked LSE finite\n");
                              ++failures; break; }

  failures += selftest_decode_gqa();
  failures += selftest_fp8_varlen();

  std::printf(failures ? "SELFTEST FAIL (%d)\n" : "SELFTEST PASS\n", failures);
  return failures ? 1 : 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc >= 3 && std::strcmp(argv[1], "check") == 0) {
    const float tol = argc >= 4 ? std::strtof(argv[3], nullptr) : 2e-2f;
    return cmd_check(argv[2], tol, tol);
  }
  if (argc >= 3 && std::strcmp(argv[1], "info") == 0) {
    Dump d;
    if (!load(argv[2], &d)) return 2;
    info(d);
    return 0;
  }
  if (argc >= 4 && std::strcmp(argv[1], "diff") == 0)
    return cmd_diff(argv[2], argv[3]);
  if (argc >= 2 && std::strcmp(argv[1], "selftest") == 0) return selftest();
  std::fprintf(stderr,
               "usage: %s check <dump.bin> [tol] | info <dump.bin> | "
               "diff <a.bin> <b.bin> | selftest\n",
               argv[0]);
  return 2;
}
