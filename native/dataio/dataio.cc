// libspectre_dataio — native data-loading runtime.
//
// The reference feeds its models through torchvision datasets + a 16-worker
// multiprocess DataLoader (train.py:147-155) — native decode behind Python
// workers. Here the host-side work (file decode, shuffle-order batch
// assembly) is a small threaded C++ library exposed over a C ABI for ctypes
// (spectre_tpu/data/native_loader.py); the device does the augmentation.
//
// Formats:
//  - CIFAR-100 binary ("cifar-100-binary": per record 1 coarse byte +
//    1 fine byte + 3072 pixel bytes, CHW)
//  - MNIST IDX (big-endian header ubyte images/labels)
//
// All decode output is float32 in [0, 1], NCHW, labels int32.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <functional>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

uint32_t be32(const unsigned char* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

std::vector<unsigned char> read_file(const char* path) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return {};
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> buf(n);
  size_t got = std::fread(buf.data(), 1, n, f);
  std::fclose(f);
  if ((long)got != n) return {};
  return buf;
}

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned int hw = std::thread::hardware_concurrency();
  int threads = hw ? (int)hw : 2;
  if (n < 1024) threads = 1;
  std::vector<std::thread> pool;
  int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(fn, lo, hi);
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Returns number of examples decoded, or -1 on error. images must hold
// n*3*32*32 floats, labels n int32 (n = examples in file when buffers are
// large enough; pass max_n to cap).
int64_t dataio_load_cifar100_bin(const char* path, float* images,
                                 int32_t* labels, int64_t max_n) {
  auto buf = read_file(path);
  const int64_t rec = 2 + 3072;
  if (buf.empty() || buf.size() % rec) return -1;
  int64_t n = std::min<int64_t>((int64_t)buf.size() / rec, max_n);
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const unsigned char* r = buf.data() + i * rec;
      labels[i] = r[1];  // fine label
      float* out = images + i * 3072;
      for (int j = 0; j < 3072; ++j) out[j] = r[2 + j] * (1.0f / 255.0f);
    }
  });
  return n;
}

int64_t dataio_load_mnist_idx(const char* images_path, const char* labels_path,
                              float* images, int32_t* labels, int64_t max_n) {
  auto ib = read_file(images_path);
  auto lb = read_file(labels_path);
  if (ib.size() < 16 || lb.size() < 8) return -1;
  if (be32(ib.data()) != 0x803 || be32(lb.data()) != 0x801) return -1;
  int64_t n = std::min<int64_t>(be32(ib.data() + 4), max_n);
  // the labels file must cover n too (a truncated labels file would be an
  // out-of-bounds heap read below)
  n = std::min<int64_t>(n, be32(lb.data() + 4));
  int64_t rows = be32(ib.data() + 8), cols = be32(ib.data() + 12);
  if ((int64_t)ib.size() < 16 + n * rows * cols) return -1;
  if ((int64_t)lb.size() < 8 + n) return -1;
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      labels[i] = lb[8 + i];
      const unsigned char* r = ib.data() + 16 + i * rows * cols;
      float* out = images + i * rows * cols;
      for (int64_t j = 0; j < rows * cols; ++j) out[j] = r[j] * (1.0f / 255.0f);
    }
  });
  return n;
}

// Gather a shuffled batch: out[i] = images[perm[i]] — the DataLoader's
// collate step, threaded over samples.
void dataio_gather_batch(const float* images, const int32_t* labels,
                         const int64_t* perm, int64_t batch,
                         int64_t sample_elems, float* out_images,
                         int32_t* out_labels) {
  parallel_for(batch, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(out_images + i * sample_elems,
                  images + perm[i] * sample_elems,
                  sizeof(float) * sample_elems);
      out_labels[i] = labels[perm[i]];
    }
  });
}

}  // extern "C"
