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


def make_block_mix_tables(
    key: jax.Array, num_heads: int, d: int, blk: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Block-structured per-head permutations + per-element +-1 signs.

    Same storage format as ``make_mix_tables`` (perms [H, d] int32, signs
    [1, H, d]) but the permutation moves whole ``blk``-element blocks:
    ``perm[h, jb*blk + t] = bperm[h, jb]*blk + t``. TPU rationale: HBM is
    (8, 128)-tiled, so the mix-backward's random single-row gathers pay an
    8x tile read amplification (ops/pallas/bwd_gather.py module docstring);
    with blk >= 8 every fetched tile is wanted and the backward streams at
    full bandwidth (block_gather_sum_pallas). Signs stay element-wise, so
    per-element sign randomness is preserved; only the permutation's
    granularity changes (convergence parity vs uniform is checked in
    benchmarks/convergence_ab.py --mix-block). Reference context:
    layers.py:61-65 samples torch.randperm(d) uniformly.
    """
    if d % blk:
        raise ValueError(f"mix_block={blk} must divide d={d}")
    if blk & (blk - 1):
        # detect_block_size (route registration) probes power-of-two sizes
        # only; a non-pow2 block table would silently never get the fast
        # backward — reject it up front
        raise ValueError(f"mix_block={blk} must be a power of two")
    kp, ks = jax.random.split(key)
    nb = d // blk
    bperms = jnp.stack(
        [jax.random.permutation(k, nb) for k in jax.random.split(kp, num_heads)]
    ).astype(jnp.int32)
    perms = (bperms[:, :, None] * blk
             + jnp.arange(blk, dtype=jnp.int32)).reshape(num_heads, d)
    signs = jax.random.randint(ks, (num_heads, d), 0, 2).astype(jnp.float32) * 2 - 1
    return perms, signs[None]


def detect_block_size(perms, min_blk: int = 8) -> int:
    """Largest power-of-two blk >= min_blk such that every head's perm is
    block-structured (``perm[h, jb*blk+t] = base[h, jb] + t`` with
    blk-aligned bases), else 0. Host-side (concrete arrays only)."""
    import numpy as np

    perms = np.asarray(perms)
    h, d = perms.shape
    blk = 1
    while d % (blk * 2) == 0:
        blk *= 2
    while blk >= min_blk:
        if d % blk == 0:
            p = perms.reshape(h, d // blk, blk)
            if ((p[..., 0] % blk == 0).all()
                    and (p == p[..., :1] + np.arange(blk)).all()):
                return blk
        blk //= 2
    return 0


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
    mixed = jnp.take(x, perms, axis=1, mode="clip") * signs  # [B, H, d]
    return mixed.reshape(B, token_dim, -1)  # [B, N, E*H]


def _hadamard_matrix_np(n: int):
    import numpy as np

    h = np.asarray([[1.0]], dtype=np.float32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def hadamard_matrix(n: int, dtype=jnp.float32, normalize: bool = True) -> jnp.ndarray:
    """Dense H_n (Sylvester/natural order). Orthonormal when normalized."""
    h = jnp.asarray(_hadamard_matrix_np(n), dtype=dtype)
    return h * (n ** -0.5) if normalize else h


def pick_tile(d: int, max_tile: int = 128) -> int:
    """Largest power-of-two <= max_tile dividing d (128 = one TPU lane tile)."""
    t = max_tile
    while t > 1 and d % t:
        t //= 2
    return t


def make_structured_tables(
    key: jax.Array, num_heads: int, d: int, tile: int | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Tables for the tile-structured mixer: per-head random *tile* permutation
    [H, T] and per-element random signs [1, H, d].

    TPU design (SURVEY.md §7 'hard parts'): an arbitrary d-element gather is
    irregular memory traffic the VPU/MXU can't vectorize. The structured mixer
    factors the random orthogonal mix as

        y_h = (P_tile_h . D_h . x) @ (I_T kron H_tile)

    i.e. random +-1 signs (VPU multiply), a permutation of contiguous 128-lane
    tiles (pure block data movement — BlockSpec index remap, zero compute),
    and a shared intra-tile Hadamard (one [tile, tile] matmul per tile on the
    MXU). This is the SRHT/fast-JL construction: same mixing statistics as
    sign+permutation (each output is a random-sign combination spanning the
    whole sequence after tile shuffling), but every byte moves in contiguous
    tiles. Exact reference semantics remain available via ``permut_mix``.
    """
    t = tile or pick_tile(d)
    n_tiles = d // t
    kp, ks = jax.random.split(key)
    tile_perms = jnp.stack(
        [jax.random.permutation(k, n_tiles) for k in jax.random.split(kp, num_heads)]
    ).astype(jnp.int32)
    # signs apply AFTER the intra-tile Hadamard (structured_mix): the
    # composition is D_s . (I kron H_t) . P_tile; an output-side diagonal
    # lets the Pallas kernel stay a pure block-gather+matmul with the sign
    # flip fused into the surrounding XLA elementwise pass.
    signs = jax.random.randint(ks, (num_heads, d), 0, 2).astype(jnp.float32) * 2 - 1
    return tile_perms, signs[None]


def structured_mix(
    x: jnp.ndarray,
    tile_perms: jnp.ndarray,
    signs: jnp.ndarray,
    token_dim: int,
) -> jnp.ndarray:
    """jnp reference of the structured mixer (Pallas kernel:
    ops/pallas/structured_mix.py). x: [B, N, E] or [B, d] -> [B, token_dim, -1].
    """
    B = x.shape[0]
    x = x.reshape(B, -1)
    d = x.shape[-1]
    H, n_tiles = tile_perms.shape
    t = d // n_tiles
    had = hadamard_matrix(t, x.dtype)
    xt = x.reshape(B, n_tiles, t)
    # [B, H, T, t]: per-head tile gather (block moves), then H_t, then signs
    gathered = jnp.take(xt, tile_perms, axis=1,
                        mode="clip")  # [B, H, T, t]
    mixed = jnp.einsum("bhnt,ts->bhns", gathered, had)
    mixed = mixed * signs.reshape(1, H, n_tiles, t)
    return mixed.reshape(B, token_dim, -1)


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
