# SpectreViT on CIFAR-100 — the flagship config.
# Values mirror the reference spectre_vit/configs/spectre_vit_cifar100.py:1-22
# (batch_size raised for TPU efficiency; the reference's B=8 starves any
# accelerator — see SURVEY.md §6 targets: images/sec/chip is the north star).
_base_ = "default.py"

model = "spectre_vit"
method = "permut_mix"
dataset = "cifar100"

batch_size = 256
val_batch_size = 512
epochs = 100
num_classes = 100
patch_size = 4
img_size = 32
in_channels = 3
num_heads = 16
dropout = 0.001
hidden_dim = 768
adam_weight_decay = 0.01
adam_betas = (0.9, 0.999)
activation = "gelu"
num_encoders = 4
embed_dim = 512
num_patches = (img_size // patch_size) ** 2  # 64
use_spectre = True
spectre_threshold = 1.0

# TPU-first permutation distribution (round 3): sample the mix permutations
# block-structured (whole 64-row blocks move; signs stay element-wise) so the
# backward runs the full-bandwidth Pallas block-DMA gather instead of the
# 8x-tile-amplified row takes that are the measured floor for UNIFORM tables
# (BASELINE.md "settled by experiment"). Measured on v5e, B=1024: 162.2 ->
# 131.5 ms/step (6,314 -> 7,786 img/s/chip, MFU 34.8%). Convergence parity
# holds when d/blk >> 1 movable units per head (here 33280/64 = 520; A/B in
# benchmarks/convergence_ab.py --mix-block, BASELINE.md "round-3 addendum").
# The reference samples uniform tables (layers.py:61-65) — set mix_block = 0
# to reproduce that distribution exactly; all parity/oracle tests transfer
# the reference's own tables and are unaffected by the sampling default.
mix_block = 64
