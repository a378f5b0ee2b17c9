"""Sign-flip + permutation token/channel mixing (the "attention replacement").

Reference semantics (``MHPermutMix``, layers.py:53-73): the whole [N, E]
sequence is flattened to a d = N*E vector; each of H heads applies a fixed
random permutation followed by a fixed random +-1 sign flip; the H mixed
copies are reinterpreted as an [N, E*H] sequence and projected back.

TPU design notes (SURVEY.md §7 "hard parts"): an arbitrary d-sized gather is
irregular memory traffic. Two formulations are provided:

- ``permut_mix``       exact reference semantics via a single XLA gather
                       (``take`` with a static [H, d] index table). XLA lowers
                       this to a dynamic-gather loop on TPU — correct, and the
                       parity baseline.
- tile-structured fast path: see ``spectre_tpu.ops.pallas.permut_mix`` — the
  permutation is factored into (random 128-lane-tile permutation) x
  (per-element sign) x (intra-tile Hadamard), a structured random orthogonal
  transform with the same mixing statistics that runs on contiguous tiles.

Tables are generated from a JAX PRNG key (reproducible; SURVEY.md §7 requires
fixed random tables round-trippable from checkpoints — they are stored as
model state, see models/layers.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_mix_tables(key: jax.Array, num_heads: int, d: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-head random permutations and +-1 signs.

    Equivalent state to the reference buffers (layers.py:61-65):
    perms [H, d] int32, signs [1, H, d] float32 in {-1, +1}.
    """
    kp, ks = jax.random.split(key)
    perms = jnp.stack(
        [jax.random.permutation(k, d) for k in jax.random.split(kp, num_heads)]
    ).astype(jnp.int32)
    signs = jax.random.randint(ks, (num_heads, d), 0, 2).astype(jnp.float32) * 2 - 1
    return perms, signs[None]


def permut_mix(
    x: jnp.ndarray, perms: jnp.ndarray, signs: jnp.ndarray, token_dim: int
) -> jnp.ndarray:
    """Exact reference forward (layers.py:68-73).

    x: [B, N, E] (or [B, d]); perms: [H, d]; signs: [1, H, d].
    Returns [B, token_dim, E*H] — the reshape reinterprets the contiguous
    [H, N*E] block exactly as torch ``.view`` does.
    """
    B = x.shape[0]
    x = x.reshape(B, -1)  # [B, d], token-major
    mixed = jnp.take(x, perms, axis=1) * signs  # [B, H, d]
    return mixed.reshape(B, token_dim, -1)  # [B, N, E*H]


def invert_permutation(perm: jnp.ndarray) -> jnp.ndarray:
    """inv such that inv[perm[i]] = i (useful for scatter-formulated backward).

    Accepts [d] or a batch of permutations [..., d].
    """
    d = perm.shape[-1]
    iota = jnp.arange(d, dtype=perm.dtype)
    if perm.ndim == 1:
        return jnp.zeros_like(perm).at[perm].set(iota)
    flat = perm.reshape(-1, d)
    inv = jax.vmap(lambda p: jnp.zeros_like(p).at[p].set(iota))(flat)
    return inv.reshape(perm.shape)
