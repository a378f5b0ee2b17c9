"""Block-structured mix permutations (config ``mix_block``) + their backward.

TPU rationale (ops/pallas/bwd_gather.py module docstring): HBM is
(8, 128)-tiled, so the uniform permutation's backward row-gather pays an 8x
tile read amplification. ``make_block_mix_tables`` samples permutations that
move whole blk-row blocks (signs stay element-wise), and
``block_gather_sum_pallas`` DMAs those aligned blocks directly — minimal
traffic. Reference context: /root/reference/spectre_vit/models/spectre/
layers.py:61-65 samples torch.randperm(d) uniformly; the block variant is an
opt-in TPU-first distribution change (convergence A/B checked separately).

These tests pin: table structure + detection, kernel parity vs the jnp
oracle (both SMEM table layouts, head chunking), route registration walking
real model variables, and end-to-end gradient equivalence of the routed
Pallas backward vs the default XLA backward through MHPermutMix/SpectreViT.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectre_tpu.models.layers import MHPermutMix
from spectre_tpu.ops import (
    detect_block_size,
    make_block_mix_tables,
    make_mix_tables,
)
from spectre_tpu.ops.fused_mix import (
    clear_mix_routes,
    register_block_mix_routes,
)
from spectre_tpu.ops.pallas.bwd_gather import (
    block_gather_sum_pallas,
    block_gather_sum_reference,
)


@pytest.fixture(autouse=True)
def _clean_routes():
    clear_mix_routes()
    yield
    clear_mix_routes()


@pytest.mark.parametrize("h,d,blk", [(4, 64, 8), (3, 96, 16), (2, 128, 128)])
def test_block_tables_structure_and_detection(h, d, blk):
    perms, signs = make_block_mix_tables(jax.random.key(0), h, d, blk)
    assert perms.shape == (h, d) and signs.shape == (1, h, d)
    p = np.asarray(perms)
    # each head is a real permutation of range(d)
    for row in p:
        np.testing.assert_array_equal(np.sort(row), np.arange(d))
    # block structure: perm[jb*blk + t] = base + t with blk-aligned base
    pb = p.reshape(h, d // blk, blk)
    assert (pb[..., 0] % blk == 0).all()
    np.testing.assert_array_equal(pb, pb[..., :1] + np.arange(blk))
    # signs are element-wise +-1 (not block-constant for blk > 1 w.h.p.)
    s = np.asarray(signs)[0]
    assert set(np.unique(s)) <= {-1.0, 1.0}
    if blk >= 8:
        sb = s.reshape(h, d // blk, blk)
        assert not (sb == sb[..., :1]).all(), "signs degenerated to per-block"
    # detection returns the sampled block size (largest valid power of two)
    assert detect_block_size(p) == max(blk, 8) if blk >= 8 else True


def test_detect_block_size_rejects_uniform_and_finds_largest():
    perms, _ = make_mix_tables(jax.random.key(1), 4, 256)
    assert detect_block_size(np.asarray(perms)) == 0
    # identity is block-structured at every size -> largest power of two
    ident = np.tile(np.arange(64, dtype=np.int32), (2, 1))
    assert detect_block_size(ident) == 64
    # min_blk respected
    perms8, _ = make_block_mix_tables(jax.random.key(2), 2, 128, 8)
    assert detect_block_size(np.asarray(perms8), min_blk=16) == 0


@pytest.mark.parametrize(
    "h,nb,blk,b,rpp",
    [
        (4, 16, 8, 128, 64),    # blocked SMEM spec (r//blk = 8)
        (3, 8, 16, 128, 32),    # full-table SMEM spec (r//blk = 2)
        (16, 4, 256, 128, 512), # head chunking (hc < h at the VMEM budget)
        (2, 32, 8, 256, 256),   # r == d single program
    ],
)
def test_block_gather_pallas_matches_oracle(h, nb, blk, b, rpp):
    d = nb * blk
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((h * d, b)).astype(np.float32))
    binv = jnp.asarray(
        np.stack([rng.permutation(nb) for _ in range(h)]).astype(np.int32))
    ref = block_gather_sum_reference(g, binv, blk)
    got = block_gather_sum_pallas(g, binv, blk, rows_per_program=rpp,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_block_gather_pallas_bf16():
    h, nb, blk, b = 4, 8, 8, 128
    d = nb * blk
    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.standard_normal((h * d, b))).astype(jnp.bfloat16)
    binv = jnp.asarray(
        np.stack([rng.permutation(nb) for _ in range(h)]).astype(np.int32))
    ref = np.asarray(block_gather_sum_reference(
        g.astype(jnp.float32), binv, blk))
    got = np.asarray(block_gather_sum_pallas(g, binv, blk, interpret=True)
                     .astype(jnp.float32))
    # kernel accumulates in f32, output rounds to bf16 once
    np.testing.assert_allclose(got, ref, atol=0.04, rtol=0.04)


def _folded_block_module(blk=8, h=4, e=16, n=8):
    m = MHPermutMix(embed_dim=e, token_dim=n, num_heads=h,
                    out_channels=e, impl="folded", mix_block=blk)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (16, n, e)).astype(np.float32))  # B >= 8: folded branch stays live
    v = m.init(jax.random.key(7), x)
    return m, v, x


def test_register_block_routes_walks_model_variables():
    m, v, x = _folded_block_module()
    keys = register_block_mix_routes(v)
    assert len(keys) == 1
    # uniform tables register nothing
    mu = MHPermutMix(embed_dim=16, token_dim=8, num_heads=4,
                     out_channels=16, impl="folded")
    vu = mu.init(jax.random.key(7), x)
    assert register_block_mix_routes(vu) == []


def test_routed_block_backward_matches_default():
    """The Pallas block-DMA backward (registered route) must produce the
    same input/param grads as the default XLA backward — identical math,
    different engine. Interpret mode on CPU; real-chip parity is asserted
    by benchmarks/bwd_gather_variants.py --blocks (max|diff| printed)."""
    m, v, x = _folded_block_module()

    def loss(p, xx):
        return jnp.sum(m.apply({**v, "params": p}, xx) ** 2)

    gp_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(v["params"], x)
    register_block_mix_routes(v)
    gp_rt, gx_rt = jax.grad(loss, argnums=(0, 1))(v["params"], x)
    np.testing.assert_allclose(np.asarray(gx_rt), np.asarray(gx_ref),
                               atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp_rt), jax.tree.leaves(gp_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_stale_routes_from_another_model_fall_back_to_exact_chain():
    """Routes are keyed by scope path + shape, which a SECOND same-geometry
    model in one process shares. The backward must detect that the live
    permutation buffers differ from the registered table (content guard,
    fused_mix._bwd_rows_keyed) and fall back to the exact per-head chain —
    NOT silently apply model A's inverse permutation to model B's grads."""
    m, v_a, x = _folded_block_module()
    # model B: identical geometry/scope paths, different seed -> different
    # permutation buffers under the SAME registry keys
    v_b = m.init(jax.random.key(99), x)
    assert not np.array_equal(
        np.asarray(jax.tree.leaves(v_a["buffers"])[0]),
        np.asarray(jax.tree.leaves(v_b["buffers"])[0]))

    def loss(variables, xx):
        return jnp.sum(m.apply(variables, xx) ** 2)

    clear_mix_routes()
    gx_b_ref = jax.grad(loss, argnums=1)(v_b, x)  # no routes: ground truth
    register_block_mix_routes(v_a)  # model A's routes live in the registry
    gx_b = jax.jit(jax.grad(loss, argnums=1))(v_b, x)
    np.testing.assert_allclose(np.asarray(gx_b), np.asarray(gx_b_ref),
                               atol=1e-5, rtol=1e-5)
    # and the guard must not break the matching model's own routed backward
    gx_a_ref = jax.grad(loss, argnums=1)(v_a, x)
    register_block_mix_routes(v_a)
    gx_a = jax.jit(jax.grad(loss, argnums=1))(v_a, x)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_a_ref),
                               atol=1e-5, rtol=1e-5)


def test_block_routes_shard_map_over_mesh():
    """Multi-device mesh: the Pallas block kernel has no GSPMD partitioning
    rule, so register_block_mix_routes(mesh=...) makes the backward run it
    under shard_map over the batch axis — per-device column shards, zero
    collectives. Asserts the sharded routed grads match the unrouted ones
    on the 8-device CPU test mesh (kernel in interpret mode)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU test mesh")
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    m, v, x = _folded_block_module()

    def loss(variables, xx):
        return jnp.sum(m.apply(variables, xx) ** 2)

    clear_mix_routes()
    gx_ref = jax.grad(loss, argnums=1)(v, x)
    register_block_mix_routes(v, mesh=mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    gx = jax.jit(jax.grad(loss, argnums=1))(v, xs)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               atol=1e-5, rtol=1e-5)


def test_block_model_end_to_end_and_impl_parity():
    """SpectreViT(mix_block=8): same checkpoint tree as uniform (buffer
    format unchanged), folded and gather impls agree on the block tables,
    and a jitted grad step runs with the block route registered."""
    from spectre_tpu.models import SpectreViT

    kw = dict(img_size=16, patch_size=4, in_channels=3, num_classes=10,
              embed_dim=32, num_encoders=2, num_heads=4, hidden_dim=48,
              dropout=0.0, mix_block=8)
    x = jnp.asarray(np.random.default_rng(2).uniform(
        0, 1, (16, 3, 16, 16)).astype(np.float32))
    m_fold = SpectreViT(mix_impl="folded", **kw)
    m_gath = SpectreViT(mix_impl="gather", **kw)
    v = m_fold.init(jax.random.key(3), x)
    v_uniform = SpectreViT(mix_impl="folded",
                           **{**kw, "mix_block": 0}).init(jax.random.key(3), x)
    assert jax.tree.structure(v) == jax.tree.structure(v_uniform)
    np.testing.assert_allclose(np.asarray(m_gath.apply(v, x)),
                               np.asarray(m_fold.apply(v, x)),
                               atol=1e-5, rtol=1e-5)
    keys = register_block_mix_routes(v)
    assert len(keys) == 2  # one per encoder layer
    g = jax.jit(jax.grad(
        lambda p: jnp.sum(m_fold.apply({**v, "params": p}, x) ** 2)
    ))(v["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


# ---------------------------------------------------------------------------
# round 4: FORWARD block-copy kernel (block_scatter_rows_pallas) + its route


@pytest.mark.parametrize("h,nb,blk,b", [
    (4, 16, 8, 128),    # many blocks per program
    (3, 8, 16, 128),    # odd head count
    (2, 4, 64, 256),    # one block per program at the default cap
])
def test_block_scatter_pallas_matches_take(h, nb, blk, b):
    from spectre_tpu.ops.pallas.bwd_gather import block_scatter_rows_pallas

    rng = np.random.default_rng(0)
    d = nb * blk
    xt = jnp.asarray(rng.standard_normal((d, b)).astype(np.float32))
    bsrc = jnp.asarray(np.stack([rng.permutation(nb) for _ in range(h)])
                       .astype(np.int32))
    got = block_scatter_rows_pallas(xt, bsrc, blk)
    ref = jnp.take(xt.reshape(nb, blk * b), bsrc.reshape(-1),
                   axis=0).reshape(h * d, b)
    assert (np.asarray(got) == np.asarray(ref)).all()


def test_routed_block_forward_matches_take_and_guards_stale():
    """With a block route registered and a lane-aligned batch (B % 128 == 0),
    perm_rows_t_keyed's FORWARD runs the Pallas block copy — output must be
    bit-identical to the unrouted take (it moves the same rows), and a stale
    route (different live buffers under the same key) must fall back to the
    exact take via the content guard."""
    m, v, _ = _folded_block_module()
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (128, 8, 16)).astype(np.float32))  # B=128: forward route engages

    # separate jit wrappers: the route registry is trace-time state the jit
    # cache cannot see, so one shared jit(m.apply) would silently reuse the
    # first trace for both registry states
    clear_mix_routes()
    y_ref = jax.jit(lambda vv, xx: m.apply(vv, xx))(v, x)
    register_block_mix_routes(v)
    y_rt = jax.jit(lambda vv, xx: m.apply(vv, xx))(v, x)
    assert (np.asarray(y_rt) == np.asarray(y_ref)).all()

    # stale route: model B shares scope/shape but has different tables
    v_b = m.init(jax.random.key(99), x)
    clear_mix_routes()
    y_b_ref = jax.jit(lambda vv, xx: m.apply(vv, xx))(v_b, x)
    register_block_mix_routes(v)  # A's routes live under B's keys
    y_b = jax.jit(lambda vv, xx: m.apply(vv, xx))(v_b, x)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_b_ref),
                               atol=1e-6, rtol=1e-6)


def test_routed_block_forward_small_batch_uses_take():
    """B not lane-aligned: the forward route must stay on the plain take
    (guard in fused_mix._rows_fwd_impl) — semantics unchanged."""
    m, v, x = _folded_block_module()  # B=16
    clear_mix_routes()
    y_ref = m.apply(v, x)
    register_block_mix_routes(v)
    y_rt = jax.jit(m.apply)(v, x)
    np.testing.assert_allclose(np.asarray(y_rt), np.asarray(y_ref),
                               atol=1e-6, rtol=1e-6)


def test_fused_block_bwd_kernel_matches_chain_oracle():
    """The fused GEMM+block-gather backward kernel (round-5 structural
    study — measured SLOWER than the production chain at flagship shape,
    7.37 vs 4.73 ms, because its blk-row GEMMs cap MXU sublane utilization
    at 50%; BASELINE.md 'structural floor'). Kept in-tree with its parity
    pinned: it is the only formulation that never materializes the
    [H·d, B] cotangent, and becomes relevant if a future geometry is
    bandwidth- rather than FLOP-bound."""
    from spectre_tpu.ops.pallas.bwd_gather import (
        fused_block_bwd_pallas,
        fused_block_bwd_reference,
    )

    rng = np.random.default_rng(3)
    h, blk, e, n, b, o = 4, 8, 32, 5, 24, 16
    d = n * e
    eh = e * h
    nb = d // blk
    binv = jnp.asarray(np.stack([rng.permutation(nb) for _ in range(h)])
                       .astype(np.int32))
    dy = jnp.asarray(rng.standard_normal((n, b, o)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((eh, o)).astype(np.float32))
    s4 = jnp.asarray(rng.choice([-1.0, 1.0], (n, eh)).astype(np.float32))
    got = fused_block_bwd_pallas(dy, w, s4, binv, blk, interpret=True)
    want = fused_block_bwd_reference(dy, w, s4, binv, blk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)
