// AMX int8 tile-GEMM probe at the mix-projection shape (VERDICT r4 #7).
//
// The bench host advertises amx-int8/amx-bf16/amx-tile; the shipped int8
// path peaks at ~280 GOP/s through AVX512-VNNI (VPDPBUSD, 64 MACs/instr)
// while one TDPBUSD retires 16x16x64 = 16384 MACs. This probe measures a
// 2x2-tile-blocked u8*s8 GEMM at the exact mix shape the runtime quantizes
// (M=4160 tokens, K=8192, N=512) against the same-shape VNNI kernel, to
// decide whether AMX earns a place under --int8 (spectre_model.h) or gets
// recorded as a dead end (BASELINE.md serving section).
//
// AMX notes:
// - Linux gates the 8 KiB tile-register xstate behind
//   arch_prctl(ARCH_REQ_XCOMP_PERM, XFEATURE_XTILEDATA) — requested at
//   startup; failure => the kernel denies AMX here (recorded as such).
// - B must be VNNI-packed [K/4][N][4] — the SAME layout QuantW.packed
//   already uses (spectre_model.h:380), so a B tile is a plain strided
//   load (stride N*4) from the existing buffer: integration would need no
//   repacking.
//
// Build + run: make -C native amx && ./native/build/amx_probe
#include <immintrin.h>
#include <sys/syscall.h>
#include <unistd.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

#ifndef ARCH_REQ_XCOMP_PERM
#define ARCH_REQ_XCOMP_PERM 0x1023
#endif
#define XFEATURE_XTILEDATA 18

struct TileCfg {
  uint8_t palette = 1;
  uint8_t start_row = 0;
  uint8_t reserved[14] = {};
  uint16_t colsb[16] = {};
  uint8_t rows[16] = {};
};

static bool request_amx() {
  return syscall(SYS_arch_prctl, ARCH_REQ_XCOMP_PERM, XFEATURE_XTILEDATA) == 0;
}

// C[M,N] s32 += A[M,K] u8 * B_vnni[K/4][N][4] s8; M%32==0, N%32==0, K%64==0.
// 2x2 C tiles (tmm0-3), A tiles tmm4-5, B tiles tmm6-7 — the canonical AMX
// blocking. ``kc`` blocks K so the active B panel (kc/4 rows x N*4 bytes)
// stays L2-resident across the whole m sweep — the same cache discipline
// that took the f32 kernel 37 -> 76 GFLOP/s and the VNNI kernel to 280
// (spectre_model.h gemm_kc); C tiles reload+accumulate across k-blocks.
static void gemm_amx(const uint8_t* A, const int8_t* B, int32_t* C,
                     int M, int K, int N, int kc = 0) {
  TileCfg cfg;
  for (int t = 0; t < 4; ++t) { cfg.rows[t] = 16; cfg.colsb[t] = 64; }  // C s32 16x16
  for (int t = 4; t < 6; ++t) { cfg.rows[t] = 16; cfg.colsb[t] = 64; }  // A u8 16x64
  for (int t = 6; t < 8; ++t) { cfg.rows[t] = 16; cfg.colsb[t] = 64; }  // B vnni 16x(16*4)
  _tile_loadconfig(&cfg);
  const size_t bstride = (size_t)N * 4;   // bytes per VNNI k-group row
  if (kc <= 0) kc = K;
  for (int k0 = 0; k0 < K; k0 += kc) {
    const int kend = k0 + kc < K ? k0 + kc : K;
    for (int m = 0; m < M; m += 32) {
      for (int n = 0; n < N; n += 32) {
        if (k0 == 0) {
          _tile_zero(0); _tile_zero(1); _tile_zero(2); _tile_zero(3);
        } else {
          _tile_loadd(0, C + (size_t)m * N + n, N * 4);
          _tile_loadd(1, C + (size_t)m * N + n + 16, N * 4);
          _tile_loadd(2, C + (size_t)(m + 16) * N + n, N * 4);
          _tile_loadd(3, C + (size_t)(m + 16) * N + n + 16, N * 4);
        }
        for (int k = k0; k < kend; k += 64) {
          _tile_loadd(4, A + (size_t)m * K + k, K);
          _tile_loadd(5, A + (size_t)(m + 16) * K + k, K);
          _tile_loadd(6, B + (size_t)(k / 4) * bstride + (size_t)n * 4, bstride);
          _tile_loadd(7, B + (size_t)(k / 4) * bstride + (size_t)(n + 16) * 4, bstride);
          _tile_dpbusd(0, 4, 6);
          _tile_dpbusd(1, 4, 7);
          _tile_dpbusd(2, 5, 6);
          _tile_dpbusd(3, 5, 7);
        }
        _tile_stored(0, C + (size_t)m * N + n, N * 4);
        _tile_stored(1, C + (size_t)m * N + n + 16, N * 4);
        _tile_stored(2, C + (size_t)(m + 16) * N + n, N * 4);
        _tile_stored(3, C + (size_t)(m + 16) * N + n + 16, N * 4);
      }
    }
  }
  _tile_release();
}

// the shipped VNNI reference kernel's inner shape (8 rows x 48 cols per
// block, 3 zmm of s32 each) — simplified same-math version for an
// apples-to-apples same-process comparison
static void gemm_vnni(const uint8_t* A, const int8_t* B, int32_t* C,
                      int M, int K, int N) {
#ifdef __AVX512VNNI__
  for (int m = 0; m < M; ++m) {
    for (int n = 0; n < N; n += 16) {
      __m512i acc = _mm512_setzero_si512();
      const int8_t* bp = B + (size_t)n * 4;
      const uint8_t* ap = A + (size_t)m * K;
      for (int k = 0; k < K; k += 4) {
        __m512i av = _mm512_set1_epi32(*(const int32_t*)(ap + k));
        __m512i wv = _mm512_loadu_si512(bp + (size_t)(k / 4) * N * 4);
        acc = _mm512_dpbusd_epi32(acc, av, wv);
      }
      _mm512_storeu_si512(C + (size_t)m * N + n, acc);
    }
  }
#endif
}

static void gemm_scalar(const uint8_t* A, const int8_t* B, int32_t* C,
                        int M, int K, int N) {
  for (int m = 0; m < M; ++m)
    for (int n = 0; n < N; ++n) {
      int64_t s = 0;
      for (int k = 0; k < K; ++k)
        s += (int)A[(size_t)m * K + k] *
             (int)B[(size_t)(k / 4) * N * 4 + (size_t)n * 4 + (k & 3)];
      C[(size_t)m * N + n] = (int32_t)s;
    }
}

int main(int argc, char** argv) {
  int M = 4160, K = 8192, N = 512, reps = 5;
  if (argc > 3) { M = atoi(argv[1]); K = atoi(argv[2]); N = atoi(argv[3]); }
  if (!request_amx()) {
    printf("AMX: arch_prctl(ARCH_REQ_XCOMP_PERM, XTILEDATA) DENIED — "
           "kernel refuses tile state on this host; AMX unusable.\n");
    return 2;
  }
  std::mt19937 rng(0);
  std::vector<uint8_t> A((size_t)M * K);
  std::vector<int8_t> B((size_t)(K / 4) * N * 4);
  for (auto& v : A) v = (uint8_t)(rng() & 0xff);
  for (auto& v : B) v = (int8_t)((rng() & 0xff) - 128);
  std::vector<int32_t> C((size_t)M * N), Cr((size_t)M * N);

  // correctness at a small shape first
  {
    int m2 = 32, k2 = 128, n2 = 32;
    std::vector<int32_t> c1((size_t)m2 * n2), c2((size_t)m2 * n2);
    // scalar needs a contiguous [k2/4][n2][4] B — repack from the big one
    std::vector<int8_t> Bs((size_t)(k2 / 4) * n2 * 4);
    for (int k = 0; k < k2; ++k)
      for (int n = 0; n < n2; ++n)
        Bs[(size_t)(k / 4) * n2 * 4 + (size_t)n * 4 + (k & 3)] =
            B[(size_t)(k / 4) * N * 4 + (size_t)n * 4 + (k & 3)];
    // and a contiguous A with stride k2
    std::vector<uint8_t> As((size_t)m2 * k2);
    for (int m = 0; m < m2; ++m)
      memcpy(&As[(size_t)m * k2], &A[(size_t)m * K], k2);
    gemm_amx(As.data(), Bs.data(), c1.data(), m2, k2, n2);
    gemm_scalar(As.data(), Bs.data(), c2.data(), m2, k2, n2);
    if (memcmp(c1.data(), c2.data(), c1.size() * 4) != 0) {
      printf("AMX correctness check FAILED\n");
      return 1;
    }
    printf("AMX correctness vs scalar: exact (%dx%dx%d)\n", m2, k2, n2);
  }

  const double ops = 2.0 * M * N * (double)K;
  auto bench = [&](const char* name, auto fn) {
    fn();  // warmup
    auto t0 = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; ++r) fn();
    double s = std::chrono::duration<double>(
                   std::chrono::steady_clock::now() - t0).count() / reps;
    printf("%-22s %8.2f ms  %8.1f GOP/s\n", name, s * 1e3, ops / s / 1e9);
    return ops / s / 1e9;
  };
  printf("shape M=%d K=%d N=%d (mix projection, B=64 tokens)\n", M, K, N);
  double amx = 0;
  for (int kc : {0, 1024, 2048, 4096}) {
    char label[64];
    snprintf(label, sizeof label, "AMX 2x2-tile kc=%d", kc);
    double g = bench(label, [&] {
      gemm_amx(A.data(), B.data(), C.data(), M, K, N, kc);
    });
    if (g > amx) amx = g;
  }
  double vnni = bench("AVX512-VNNI reference",
                      [&] { gemm_vnni(A.data(), B.data(), Cr.data(), M, K, N); });
  if (memcmp(C.data(), Cr.data(), C.size() * 4) != 0)
    printf("note: AMX vs VNNI outputs DIFFER\n");
  else
    printf("AMX == VNNI outputs (exact)\n");
  printf("AMX/VNNI speedup: %.2fx\n", amx / vnni);
  return 0;
}
