# SpectreViT-Tiny on MNIST — CPU-runnable smoke config (BASELINE.json configs[0]).
# Mirrors reference spectre_vit/configs/spectre_vit_mnist.py:1-22 (img 28, tiny
# embed_dim = patch_size^2 * in_channels as in the reference MNIST driver,
# vit_spectre_mnist.py:27-48).
_base_ = "default.py"

model = "spectre_vit"
method = "permut_mix"
dataset = "mnist"

batch_size = 64
val_batch_size = 512
epochs = 5
num_classes = 10
patch_size = 4
img_size = 28
in_channels = 1
num_heads = 8
dropout = 0.001
hidden_dim = 256
activation = "gelu"
num_encoders = 4
embed_dim = (patch_size**2) * in_channels  # 16
num_patches = (img_size // patch_size) ** 2  # 49
use_spectre = True
spectre_threshold = 1.0
