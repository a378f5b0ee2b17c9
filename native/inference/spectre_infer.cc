// spectre_infer — standalone native inference runner for SpectreViT.
//
// The reference repo ghost-ships a Rust inference crate (".gitignore:24
// ignores inference/target; vit_spectre_cifar100.py:251 writes its test
// input) that is absent from the snapshot. This is the TPU framework's
// native-runtime equivalent: a dependency-free C++17 binary that loads the
// .stw weights container (spectre_tpu/export/weights.py) plus a key=value
// meta file and runs the full SpectreViT forward pass — spectral patch embed
// (rFFT2 folded into one GEMM, exactly like the device path), permut-mix /
// structured mixing, SpectreLinear (Linear+LayerNorm+erf-GELU+pool residual),
// encoder stack with the reference's residual topology, CLS head.
//
// Numerics are float32 and parity-checked against the JAX model in
// tests/test_native.py (<=1e-4 logits deviation).
//
// Usage:
//   spectre_infer --weights model.stw --meta meta.txt --input x.f32 \
//                 --batch 2 [--out logits.f32]

#include <atomic>
#include <chrono>
#include <cstring>
#include <fstream>
#include <iostream>
#include <map>
#include <string>
#include <thread>
#include <vector>

#include "spectre_model.h"

using namespace spectre;

int main(int argc, char** argv) {
  std::map<std::string, std::string> args;
  for (int i = 1; i + 1 < argc; i += 2) args[argv[i]] = argv[i + 1];
  if (!args.count("--weights") || !args.count("--meta") || !args.count("--input")) {
    std::cerr << "usage: spectre_infer --weights w.stw --meta meta.txt "
                 "--input x.f32 [--batch B] [--out logits.f32]\n";
    return 2;
  }
  Weights w = load_stw(args["--weights"]);
  auto meta = load_meta(args["--meta"]);
  if (meta.count("model") && meta["model"] != "spectre_vit") {
    std::cerr << "spectre_infer implements model=spectre_vit; got "
              << meta["model"] << "\n";
    return 2;
  }
  if (meta.count("method") && meta["method"] != "permut_mix") {
    std::cerr << "spectre_infer implements method=permut_mix "
                 "(gather|structured); got " << meta["method"] << "\n";
    return 2;
  }
  Config c{meta_int(meta, "img_size"), meta_int(meta, "patch_size"),
           meta_int(meta, "in_channels"), meta_int(meta, "num_classes"),
           meta_int(meta, "embed_dim"), meta_int(meta, "num_encoders"),
           meta_int(meta, "num_heads"), meta_int(meta, "hidden_dim"),
           meta.count("mix_impl") ? meta["mix_impl"] : "gather"};
  if (args.count("--int8") && args["--int8"] != "0") {
#ifdef SPECTRE_HAS_INT8
    int8_mode().store(true);
#else
    std::cerr << "--int8 requires an AVX512-VNNI build (this binary was "
                 "compiled without it)\n";
    return 2;
#endif
  }

  const int batch = args.count("--batch") ? std::stoi(args["--batch"]) : 1;
  const size_t img_elems = (size_t)c.in_channels * c.img_size * c.img_size;
  std::ifstream in(args["--input"], std::ios::binary);
  if (!in) { std::cerr << "cannot open input\n"; return 1; }
  std::vector<float> input(img_elems * batch);
  in.read(reinterpret_cast<char*>(input.data()), sizeof(float) * input.size());

  // batch-parallel forward (shared worker-pool helper, spectre_model.h)
  std::vector<const float*> samples;
  for (int b = 0; b < batch; ++b)
    samples.push_back(input.data() + img_elems * b);
  std::vector<std::vector<float>> per_sample;
  auto run_all = [&]() { forward_batch(w, c, samples, per_sample); };
  run_all();

  if (args.count("--repeat")) {  // latency bench mode
    const int reps = std::stoi(args["--repeat"]);
    auto t0 = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; ++r) run_all();
    double ms = std::chrono::duration<double, std::milli>(
                    std::chrono::steady_clock::now() - t0).count() / reps;
    std::cout << "batch=" << batch << " " << ms << " ms/batch ("
              << batch / ms * 1000.0 << " img/s)\n";
  }

  std::vector<float> all_logits;
  for (int b = 0; b < batch; ++b) {
    const auto& logits = per_sample[b];
    int best = 0;
    for (size_t k = 1; k < logits.size(); ++k)
      if (logits[k] > logits[best]) best = (int)k;
    std::cout << "sample " << b << " argmax " << best << " logits";
    for (float v : logits) std::cout << " " << v;
    std::cout << "\n";
    all_logits.insert(all_logits.end(), logits.begin(), logits.end());
  }
  if (args.count("--out")) {
    std::ofstream out(args["--out"], std::ios::binary);
    out.write(reinterpret_cast<const char*>(all_logits.data()),
              sizeof(float) * all_logits.size());
  }
  return 0;
}
