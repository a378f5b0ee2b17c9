# DINOv3-teacher → SpectreViT-student distillation on CIFAR-100
# (BASELINE.json configs[4]). Loss mix and temperature follow the reference
# distillation driver (train.py:334-348): soft-target KL at T=2 weighted 0.25
# plus hard CE weighted 0.75. Teacher and student run on the same chip,
# data-parallel over ICI.
_base_ = "spectre_vit_cifar100.py"

use_distillation = True
distill_temperature = 2.0
distill_alpha = 0.25
teacher = "dinov3_vits16"
teacher_img_size = 224        # teacher view is upsampled (reference train.py:92-99)
teacher_embed_dim = 384
teacher_checkpoint = None     # path to imported torch weights (see distill/teacher.py)
# "imagenet" (default): bilinear resize + ImageNet stats — what DINO
# teachers expect. "reference": the recipe's exact transform_dino
# (bicubic Resize(256)+CenterCrop(224)+CIFAR stats, reference
# train.py:91-97) — REQUIRED for KD parity runs against the reference
# (documented divergence, PARITY.md).
teacher_view = "imagenet"
