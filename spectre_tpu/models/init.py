"""torch-parity parameter initializers.

The convergence A/B (benchmarks/convergence_ab.py) isolated a trained-accuracy
gap to INITIALIZATION alone: starting the spectre_tpu trainer from the torch
model's exact init reproduced the reference's final val accuracy bit-for-bit
(BASELINE.md "Convergence A/B"), while flax defaults (lecun_normal kernels,
zero biases) converged measurably worse on the same data. torch ``nn.Linear``
/ ``nn.Conv2d`` draw

    W ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in))     (kaiming_uniform, a=sqrt(5))
    b ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in))

(1/3 the variance of lecun_normal). These initializers reproduce that
distribution; every Dense/Conv/linear-like param in the model zoo uses them.
"""

from __future__ import annotations

import flax.linen as nn
import jax

# kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan), 1/sqrt(fan)):
# variance_scaling uniform draws U(-sqrt(3*scale/fan), ...) -> scale = 1/3.
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch Linear/Conv bias init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    bound = float(fan_in) ** -0.5

    def init(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
