# SpectreBranch dual-path model on CIFAR-100.
# Mirrors reference spectre_vit/configs/spectre_branch.py:1-22 (embed_dim=768 —
# the reference model hard-codes 768 in its fusion projections,
# spectre_branch.py:105; here the fusion width follows embed_dim but the config
# keeps 768 for parity).
_base_ = "default.py"

model = "spectre_branch"
method = "permut_mix"
dataset = "cifar100"

batch_size = 256
val_batch_size = 512
epochs = 100
num_classes = 100
patch_size = 4
img_size = 32
in_channels = 3
num_heads = 8
dropout = 0.001
hidden_dim = 256
activation = "gelu"
num_encoders = 4
embed_dim = 768
num_patches = (img_size // patch_size) ** 2
use_spectre = True
spectre_threshold = 1.0
