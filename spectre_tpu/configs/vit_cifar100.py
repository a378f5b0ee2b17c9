# Baseline attention ViT-S on CIFAR-100 (BASELINE.json configs[1]).
# Mirrors reference spectre_vit/configs/vit_cifar100.py:1-23.
_base_ = "default.py"

model = "vit"
method = "attention"
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
activation = "gelu"
num_encoders = 4
embed_dim = 512
num_patches = (img_size // patch_size) ** 2
use_spectre = False
spectre_threshold = 1.0
