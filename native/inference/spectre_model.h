// spectre_model.h — shared SpectreViT forward implementation for the
// native runtime (CLI runner native/inference/spectre_infer.cc and the
// serving daemon native/serving/spectre_serve.cc).
//
// Loads the .stw weights container (spectre_tpu/export/weights.py) + a
// key=value meta file and runs the full SpectreViT forward pass — spectral
// patch embed (rFFT2 folded into one GEMM, exactly like the device path),
// permut-mix / structured mixing, SpectreLinear (Linear+LayerNorm+erf-GELU+
// pool residual), encoder stack with the reference residual topology
// (/root/reference/spectre_vit/models/spectre/spectre.py:29-202), CLS head.
// float32 numerics, parity-checked vs JAX in tests/test_native.py.

#ifndef SPECTRE_MODEL_H_
#define SPECTRE_MODEL_H_

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <iostream>
#include <map>
#include <string>
#include <thread>
#include <vector>

namespace spectre {

struct Tensor {
  std::vector<uint32_t> dims;
  std::vector<float> f;
  std::vector<int32_t> i;
  size_t size() const {
    size_t n = 1;
    for (auto d : dims) n *= d;
    return n;
  }
};

using Weights = std::map<std::string, Tensor>;

inline Weights load_stw(const std::string& path) {
  std::ifstream in(path, std::ios::binary);
  if (!in) { std::cerr << "cannot open " << path << "\n"; std::exit(1); }
  char magic[4];
  in.read(magic, 4);
  if (std::strncmp(magic, "STW1", 4) != 0) { std::cerr << "bad magic\n"; std::exit(1); }
  uint32_t n;
  in.read(reinterpret_cast<char*>(&n), 4);
  Weights w;
  for (uint32_t t = 0; t < n; ++t) {
    uint32_t name_len, dtype, ndim;
    in.read(reinterpret_cast<char*>(&name_len), 4);
    std::string name(name_len, '\0');
    in.read(name.data(), name_len);
    in.read(reinterpret_cast<char*>(&dtype), 4);
    in.read(reinterpret_cast<char*>(&ndim), 4);
    Tensor tensor;
    tensor.dims.resize(ndim);
    in.read(reinterpret_cast<char*>(tensor.dims.data()), 4 * ndim);
    size_t count = tensor.size();
    if (dtype == 0) {
      tensor.f.resize(count);
      in.read(reinterpret_cast<char*>(tensor.f.data()), 4 * count);
    } else {
      tensor.i.resize(count);
      in.read(reinterpret_cast<char*>(tensor.i.data()), 4 * count);
    }
    w.emplace(std::move(name), std::move(tensor));
  }
  return w;
}

inline std::string trim(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r");
  size_t b = s.find_last_not_of(" \t\r");
  return a == std::string::npos ? "" : s.substr(a, b - a + 1);
}

inline std::map<std::string, std::string> load_meta(const std::string& path) {
  std::map<std::string, std::string> meta;
  std::ifstream in(path);
  if (!in) { std::cerr << "cannot open " << path << "\n"; std::exit(1); }
  std::string line;
  while (std::getline(in, line)) {
    auto eq = line.find('=');
    if (eq == std::string::npos || line.empty() || line[0] == '#') continue;
    meta[trim(line.substr(0, eq))] = trim(line.substr(eq + 1));
  }
  return meta;
}

// Required integer meta key: a missing/malformed key reports WHICH key is
// wrong instead of an uncaught std::invalid_argument from stoi("").
inline int meta_int(const std::map<std::string, std::string>& meta,
                    const std::string& key) {
  auto it = meta.find(key);
  if (it == meta.end() || it->second.empty()) {
    std::cerr << "meta file is missing required key '" << key << "'\n";
    std::exit(2);
  }
  try {
    return std::stoi(it->second);
  } catch (const std::exception&) {
    std::cerr << "meta key '" << key << "' is not an integer: '"
              << it->second << "'\n";
    std::exit(2);
  }
}

inline const Tensor& get(const Weights& w, const std::string& k) {
  auto it = w.find(k);
  if (it == w.end()) { std::cerr << "missing tensor " << k << "\n"; std::exit(1); }
  return it->second;
}

// out[M,N] = x[M,K] @ w[K,N] (+bias[N] if given)
inline void gemm(const float* x, const float* w, const float* bias, float* out,
          int M, int K, int N) {
  for (int m = 0; m < M; ++m) {
    float* o = out + (size_t)m * N;
    if (bias) std::memcpy(o, bias, sizeof(float) * N);
    else std::memset(o, 0, sizeof(float) * N);
    const float* xr = x + (size_t)m * K;
    for (int k = 0; k < K; ++k) {
      const float a = xr[k];
      if (a == 0.0f) continue;
      const float* wr = w + (size_t)k * N;
      for (int n = 0; n < N; ++n) o[n] += a * wr[n];
    }
  }
}

inline void layer_norm(float* x, const float* scale, const float* bias, int M, int N,
                float eps = 1e-5f) {
  for (int m = 0; m < M; ++m) {
    float* r = x + (size_t)m * N;
    double mu = 0;
    for (int n = 0; n < N; ++n) mu += r[n];
    mu /= N;
    double var = 0;
    for (int n = 0; n < N; ++n) { double d = r[n] - mu; var += d * d; }
    var /= N;  // biased, matching jnp.var / torch LayerNorm
    const float inv = 1.0f / std::sqrt((float)var + eps);
    for (int n = 0; n < N; ++n)
      r[n] = ((float)(r[n] - mu)) * inv * scale[n] + bias[n];
  }
}

inline float gelu(float v) {  // exact erf form (torch nn.GELU default)
  return 0.5f * v * (1.0f + std::erf(v * 0.70710678118654752440f));
}

// torch AdaptiveAvgPool1d over the last axis
inline void adaptive_pool(const float* x, float* out, int M, int L, int Lo) {
  for (int m = 0; m < M; ++m) {
    const float* r = x + (size_t)m * L;
    float* o = out + (size_t)m * Lo;
    for (int i = 0; i < Lo; ++i) {
      int start = (int)(((int64_t)i * L) / Lo);
      int end = (int)((((int64_t)(i + 1)) * L + Lo - 1) / Lo);
      float s = 0;
      for (int j = start; j < end; ++j) s += r[j];
      o[i] = s / (end - start);
    }
  }
}

// SpectreLinear: GELU(LN(x@w + b)) + adaptive_pool(x) (models/layers.py)
inline void spectre_linear(const Weights& w, const std::string& prefix,
                    const std::vector<float>& x, std::vector<float>& out,
                    int M, int K) {
  const Tensor& kernel = get(w, prefix + ".kernel");
  const int N = kernel.dims[1];
  out.assign((size_t)M * N, 0.0f);
  gemm(x.data(), kernel.f.data(), get(w, prefix + ".bias").f.data(),
       out.data(), M, K, N);
  layer_norm(out.data(), get(w, prefix + ".ln_scale").f.data(),
             get(w, prefix + ".ln_bias").f.data(), M, N);
  for (auto& v : out) v = gelu(v);
  if (K == N) {
    for (size_t idx = 0; idx < out.size(); ++idx) out[idx] += x[idx];
  } else {
    std::vector<float> pooled((size_t)M * N);
    adaptive_pool(x.data(), pooled.data(), M, K, N);
    for (size_t idx = 0; idx < out.size(); ++idx) out[idx] += pooled[idx];
  }
}

struct Config {
  int img_size, patch_size, in_channels, num_classes, embed_dim;
  int num_encoders, num_heads, hidden_dim;
  std::string mix_impl;  // "structured" | anything else = exact gather math
                         // ("gather"/"folded"/"gather_tm"/"gather_unfused"
                         // are schedule variants of the SAME computation and
                         // share one param/buffer tree — models/layers.py)
};

// spectral patch embed: fold rfft2(ortho).real + freq weights + projection
// into one [C*P*P, E] matrix (ops/fft.py spectral_patch_matrix), then embed
// patches with a single GEMM.
inline void spectral_patch_embed(const Weights& w, const Config& c,
                          const float* img,  // [C, H, W]
                          std::vector<float>& tokens /* [N+1, E] */) {
  const int P = c.patch_size, C = c.in_channels, E = c.embed_dim;
  const int F = P / 2 + 1, nside = c.img_size / P, N = nside * nside;
  const Tensor& proj = get(w, "params.embeddings_block.proj_kernel");  // [C*P*F, E]
  const Tensor& fh = get(w, "params.embeddings_block.freq_weight_h");  // [P]
  const Tensor& fw = get(w, "params.embeddings_block.freq_weight_w");  // [F]

  // D[(u,v),(j,k)] = cos(2pi(uj+vk)/P)/P   (rfft2 .real, ortho norm)
  std::vector<float> D((size_t)P * F * P * P);
  const float two_pi = 6.28318530717958647692f;
  for (int u = 0; u < P; ++u)
    for (int v = 0; v < F; ++v)
      for (int j = 0; j < P; ++j)
        for (int k = 0; k < P; ++k)
          D[(((size_t)u * F + v) * P + j) * P + k] =
              std::cos(two_pi * (u * j + v * k) / P) / P;

  // W_eff[c, jk, e] = sum_uv D[uv, jk] * proj[c, uv, e] * fh[u] * fw[v]
  std::vector<float> weff((size_t)C * P * P * E, 0.0f);
  for (int ch = 0; ch < C; ++ch)
    for (int u = 0; u < P; ++u)
      for (int v = 0; v < F; ++v) {
        const float fwt = fh.f[u] * fw.f[v];
        const float* prow = proj.f.data() + (((size_t)ch * P * F) + u * F + v) * E;
        const float* drow = D.data() + ((size_t)u * F + v) * P * P;
        for (int jk = 0; jk < P * P; ++jk) {
          float* wrow = weff.data() + (((size_t)ch * P * P) + jk) * E;
          const float dv = drow[jk] * fwt;
          for (int e = 0; e < E; ++e) wrow[e] += dv * prow[e];
        }
      }

  // patches [(n), (c, j, k)] with n = (i, jcol) row-major (ops/fft.py)
  std::vector<float> patches((size_t)N * C * P * P);
  for (int pi = 0; pi < nside; ++pi)
    for (int pj = 0; pj < nside; ++pj)
      for (int ch = 0; ch < C; ++ch)
        for (int j = 0; j < P; ++j)
          for (int k = 0; k < P; ++k)
            patches[(((size_t)(pi * nside + pj) * C + ch) * P + j) * P + k] =
                img[((size_t)ch * c.img_size + pi * P + j) * c.img_size + pj * P + k];

  tokens.assign((size_t)(N + 1) * E, 0.0f);
  const Tensor& cls = get(w, "params.embeddings_block.cls_token");
  std::memcpy(tokens.data(), cls.f.data(), sizeof(float) * E);
  gemm(patches.data(), weff.data(),
       get(w, "params.embeddings_block.proj_bias").f.data(),
       tokens.data() + E, N, C * P * P, E);
  const Tensor& pos = get(w, "params.embeddings_block.position_embeddings");
  for (size_t idx = 0; idx < tokens.size(); ++idx) tokens[idx] += pos.f[idx];
}

// MHPermutMix (models/layers.py): flatten [N,E] -> d, per-head permute+sign
// (gather impl) or tile-permute+sign+intra-tile Hadamard (structured impl),
// reinterpret [H, d] as [N, E*H], project with SpectreLinear.
inline void permut_mix(const Weights& w, const Config& c, const std::string& prefix,
                const std::vector<float>& x /* [N, E] */, int N,
                std::vector<float>& out) {
  const int E = c.embed_dim, d = N * E;
  const int H = (int)get(w, "buffers." + prefix + ".mix_tables.0").dims[0];
  const Tensor& signs = get(w, "buffers." + prefix + ".mix_tables.1");  // [1,H,d]
  std::vector<float> mixed((size_t)H * d);

  if (c.mix_impl == "structured") {
    const Tensor& tperm = get(w, "buffers." + prefix + ".mix_tables.0");  // [H,T]
    const int T = tperm.dims[1], t = d / T;
    // Hadamard H_t, Sylvester order, orthonormal
    std::vector<float> had((size_t)t * t);
    for (int r = 0; r < t; ++r)
      for (int cc = 0; cc < t; ++cc)
        had[(size_t)r * t + cc] = (__builtin_popcount(r & cc) & 1) ? -1.0f : 1.0f;
    const float scale = 1.0f / std::sqrt((float)t);
    for (int h = 0; h < H; ++h)
      for (int tt = 0; tt < T; ++tt) {
        const int src = tperm.i[(size_t)h * T + tt];
        // signs apply AFTER the intra-tile Hadamard (ops/permute.py)
        const float* sg = signs.f.data() + ((size_t)h * T + tt) * t;
        const float* xin = x.data() + (size_t)src * t;
        float* o = mixed.data() + ((size_t)h * T + tt) * t;
        for (int b = 0; b < t; ++b) {
          float s = 0;
          for (int a = 0; a < t; ++a) s += xin[a] * had[(size_t)a * t + b];
          o[b] = s * scale * sg[b];
        }
      }
  } else {
    const Tensor& perms = get(w, "buffers." + prefix + ".mix_tables.0");  // [H,d]
    for (int h = 0; h < H; ++h)
      for (int idx = 0; idx < d; ++idx)
        mixed[(size_t)h * d + idx] =
            x[perms.i[(size_t)h * d + idx]] * signs.f[(size_t)h * d + idx];
  }
  // view [H, d] (h-major) as [N, E*H] rows, then project
  spectre_linear(w, "params." + prefix + ".linear", mixed, out, N, E * H);
}

inline void encoder_layer(const Weights& w, const Config& c, const std::string& prefix,
                   std::vector<float>& x /* [N, E] */, int N) {
  const int E = c.embed_dim;
  // x = norm1(mix(x)) + x        (post-norm on mixer output only)
  std::vector<float> mixed;
  permut_mix(w, c, prefix + ".mix_layer", x, N, mixed);
  layer_norm(mixed.data(), get(w, "params." + prefix + ".norm1.scale").f.data(),
             get(w, "params." + prefix + ".norm1.bias").f.data(), N, E);
  for (size_t idx = 0; idx < x.size(); ++idx) x[idx] += mixed[idx];
  // x = norm2(x + ff(x)),  ff = SpectreLinear(E->hidden) -> SpectreLinear(->E)
  std::vector<float> h1, h2;
  spectre_linear(w, "params." + prefix + ".linear1", x, h1, N, E);
  spectre_linear(w, "params." + prefix + ".linear3", h1, h2, N, c.hidden_dim);
  for (size_t idx = 0; idx < x.size(); ++idx) x[idx] += h2[idx];
  layer_norm(x.data(), get(w, "params." + prefix + ".norm2.scale").f.data(),
             get(w, "params." + prefix + ".norm2.bias").f.data(), N, E);
}

inline void forward(const Weights& w, const Config& c, const float* img,
             std::vector<float>& logits) {
  const int nside = c.img_size / c.patch_size;
  const int N = nside * nside + 1;  // + CLS
  std::vector<float> x;
  spectral_patch_embed(w, c, img, x);
  std::vector<float> src = x;  // global encoder residual (spectre.py:103)
  for (int l = 0; l < c.num_encoders; ++l)
    encoder_layer(w, c, "encoder_blocks.layer_" + std::to_string(l), x, N);
  for (size_t idx = 0; idx < x.size(); ++idx) x[idx] += src[idx];
  std::vector<float> cls(x.begin(), x.begin() + c.embed_dim);
  spectre_linear(w, "params.mlp_head", cls, logits, 1, c.embed_dim);
}

// Batch-parallel forward over independent samples (one thread per core).
// Shared by the CLI runner's --batch mode and the serving daemon's dynamic
// batcher so threading fixes land in both binaries.
inline void forward_batch(const Weights& w, const Config& c,
                          const std::vector<const float*>& samples,
                          std::vector<std::vector<float>>& out) {
  const int total = (int)samples.size();
  out.resize(total);
  unsigned hw = std::thread::hardware_concurrency();
  int workers = std::min<int>(total, hw ? (int)hw : 2);
  std::atomic<int> next{0};
  std::vector<std::thread> pool;
  for (int t = 0; t < workers; ++t)
    pool.emplace_back([&]() {
      for (int b = next.fetch_add(1); b < total; b = next.fetch_add(1))
        forward(w, c, samples[b], out[b]);
    });
  for (auto& th : pool) th.join();
}

}  // namespace spectre

#endif  // SPECTRE_MODEL_H_
