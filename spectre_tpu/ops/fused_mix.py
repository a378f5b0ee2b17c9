"""Custom-VJP permut-mix: inverse-permutation backward instead of scatter.

The reference hot op (layers.py:68-73) gathers the flattened sequence with
per-head permutations. Left to autodiff, the gather's cotangent lowers to a
**scatter-add** over d = N*E elements — measured at 20 ms/layer (26% of the
whole flagship train step at B=1024, benchmarks/v5e_train_step_ops_r2start.csv).

The scatter is unnecessary: each ``perms[h]`` is a bijection, so the
cotangent of ``m[b,h,i] = x[b, perms[h,i]] * s[h,i]`` is itself a gather by
the inverse permutation,

    dx[b,j] = sum_h (g*s)[b,h,inv[h,j]],  where perms[h, inv[h,j]] = j.

The inverses are derived in the backward via argsort (argsort of a
permutation inverts it exactly, O(H d log d) — negligible next to the 80 ms
of scatters it replaces); buffers, checkpoints and the native-runner export
format stay identical to the unfused path.

Design note (what NOT to do, measured): fusing the projection GEMM + pool
residual into the same custom op and recomputing the mixed tensor in the
backward fails to compile at flagship scale — any materialization of the
[.., out, g=16] grouped view pads the 16-wide minor dim to the 128-lane
tile, a 17 GB allocation. The GEMM/LN/pool stay in XLA-land where its
fusion heuristics already handle them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def permut_mix_fused(x2d: jnp.ndarray, perms: jnp.ndarray,
                     signs2: jnp.ndarray) -> jnp.ndarray:
    """Exact reference mix semantics: [B, d] -> [B, H, d].

    x2d: [B, d]; perms: [H, d] int32 (each row a permutation of range(d));
    signs2: [H, d] +-1.
    """
    return jnp.take(x2d, perms, axis=1, mode="clip") * signs2


def _fwd(x2d, perms, signs2):
    # the op is linear: nothing activation-sized is saved
    return permut_mix_fused(x2d, perms, signs2), (perms, signs2)


def _bwd(res, g):
    perms, signs2 = res
    h, d = perms.shape
    # sign-multiply BEFORE the gather. The multiply-after-gather variant
    # (permute signs through inv, fuse the multiply into the head-sum) was
    # tried and MEASURED SLOWER (245.9 vs 236.6 ms/step): the gather output
    # lands B-minor, so the [H, d]-broadcast multiply strides badly there,
    # while g*signs runs on the natural [B, H, d] layout.
    gs = (g * signs2).reshape(g.shape[0], h * d)  # [B, H*d]
    # FLAT inverse gather: dx[b, j] = sum_h gs[b, h*d + inv[h, j]].
    # One flat take + reduce lowers ~1.5x faster than the per-head
    # take_along_axis it replaces (measured: benchmarks/mix_decompose.py —
    # XLA's flat-gather path beats its take_along_axis lowering).
    inv = jnp.argsort(perms, axis=-1)  # inverse permutations
    offs = (jnp.arange(h, dtype=inv.dtype) * d)[:, None]
    idx = (inv + offs).T.reshape(-1)  # [d*H]: row j*H+h -> h*d + inv[h, j]
    dx = jnp.take(gs, idx, axis=1,
                  mode="clip").reshape(-1, d, h).sum(axis=2)  # [B, d]
    return (dx,
            np.zeros(perms.shape, dtype=jax.dtypes.float0),
            jnp.zeros_like(signs2))


permut_mix_fused.defvjp(_fwd, _bwd)


@jax.custom_vjp
def permut_mix_fused_t(xt: jnp.ndarray, perms: jnp.ndarray,
                       signs2: jnp.ndarray) -> jnp.ndarray:
    """Token-major (transposed-layout) mix: [d, B] -> [H*d, B].

    Same math as ``permut_mix_fused`` on x.T: row ``h*d + i`` of the output
    is ``x[perms[h, i], :] * signs2[h, i]``. The gather moves B-contiguous
    ROWS — the layout XLA's gather engine already prefers — and the output
    IS the [N, E*H, B] tensor the batched projection GEMM consumes (the
    torch ``.view`` reinterpretation is an identity split of the leading
    axis), so no 1 GB relayout copies are needed on either side.
    """
    mixed = jnp.take(xt, perms.reshape(-1), axis=0,
                     mode="clip")  # [H*d, B]
    return mixed * signs2.reshape(-1, 1)


def _fwd_t(xt, perms, signs2):
    return permut_mix_fused_t(xt, perms, signs2), (perms, signs2)


def _bwd_t(res, g):
    perms, signs2 = res
    h, d = perms.shape
    gs = (g.reshape(h, d, -1) * signs2[:, :, None]).reshape(h * d, -1)
    dxt = jnp.take(gs, _inverse_row_table(perms), axis=0,
                   mode="clip")
    return (dxt.reshape(d, h, -1).sum(axis=1),  # [d, B]
            np.zeros(perms.shape, dtype=jax.dtypes.float0),
            jnp.zeros_like(signs2))


permut_mix_fused_t.defvjp(_fwd_t, _bwd_t)


def _inverse_row_table(perms: jnp.ndarray) -> jnp.ndarray:
    """[d*H] flat row-index table for the inverse of the multi-head row
    gather: entry j*H + h is ``h*d + inv[h, j]`` (perms[h, inv[h, j]] = j).

    Token-major rows of [x; d, B] move at measured ~970 GiB/s through XLA's
    flat-gather path (benchmarks/mix_decompose.py) — the inverse gather is
    expressed the same flat way, followed by a [d, H, B] head-sum reduce.
    """
    h, d = perms.shape
    inv = jnp.argsort(perms, axis=-1)
    offs = (jnp.arange(h, dtype=inv.dtype) * d)[:, None]
    return (inv + offs).T.reshape(-1)


@jax.custom_vjp
def folded_proj(g4: jnp.ndarray, w: jnp.ndarray,
                s4: jnp.ndarray) -> jnp.ndarray:
    """Folded-weight projection: y[n,b,o] = sum_e g4[n,e,b]·s4[n,e]·w[e,o].

    Forward materializes the per-token folded weights wp = s4 ⊙ w (one
    [N, in, O] build feeding a batched GEMM — the measured-fast schedule,
    models/layers.py::FoldedMixLinear). Autodiff of that expression builds
    the [N, in, O] cotangent dwp as 65 K=B outer-product GEMMs before
    reducing over tokens — numerically fine, but the remote XLA compiler's
    schedule search is PATHOLOGICAL on it at some batch sizes (measured
    compile times for one layer's backward, v5e: B=64 10 s, B=128 14 s,
    B=256 963 s, B=1024 ~fast, B=8 477 s). This custom VJP reassociates the
    backward so the intermediate never exists:

        dg4[n,e,b] = s4[n,e] · Σ_o dy[n,b,o] w[e,o]     (batched GEMM, w shared)
        dW[e,o]    = Σ_{n,b} (s4 ⊙ g4)[n,e,b] dy[n,b,o]  (ONE GEMM, K=N·B)

    Same FLOPs, no [N, in, O] cotangent, flat compile time across batch.
    """
    return jnp.einsum("neb,neo->nbo", g4, s4[:, :, None] * w[None])


def _fwd_folded_proj(g4, w, s4):
    return folded_proj(g4, w, s4), (g4, w, s4)


def _folded_dw(sg, dy, w):
    # dW contracting {n, b} directly via dot_general — XLA schedules the
    # [n,e,b] operand into the GEMM without the explicit [e, n*b] relayout
    # (a real 1.02 GiB copy at flagship shape). Measured raw-window on v5e
    # (benchmarks/folded_bwd_dw_bench.py): transpose+GEMM 4.03 ms,
    # dot_general 3.47 ms, batched-per-token + sum 3.49 ms. Shared by both
    # folded backwards (the pool term has no weights).
    return jax.lax.dot_general(
        sg, dy, (((0, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32).astype(w.dtype)


def _bwd_folded_proj(res, dy):
    g4, w, s4 = res
    dg4 = s4[:, :, None] * jnp.einsum("nbo,eo->neb", dy, w)
    sg = s4[:, :, None] * g4
    # s4 holds the checkpointed ±1 mix signs — buffers sampled once at init
    # and never trained (reference layers.py:61-65 semantics) — so its
    # cotangent is deliberately zero rather than computed.
    return dg4, _folded_dw(sg, dy, w), jnp.zeros_like(s4)


folded_proj.defvjp(_fwd_folded_proj, _bwd_folded_proj)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def folded_proj_pool(g4: jnp.ndarray, w: jnp.ndarray, s4: jnp.ndarray,
                     grp: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``folded_proj`` + the grouped sign-mean pool residual as ONE op.

    Primals are bit-identical to the separate ``folded_proj`` +
    ``einsum("nuvb,nuv->nbu")`` pair (models/layers.py::FoldedMixLinear):

        y[n,b,o]  = Σ_e g4[n,e,b] · s4[n,e] · w[e,o]
        pool[n,b,u] = Σ_v g4[n,(u·grp+v),b] · s4[n,(u·grp+v)] / grp

    The point is the BACKWARD: left to autodiff, the pool term's input
    cotangent materializes a full [N, in, B] broadcast (~1.09 GB bf16 at
    flagship, measured 1.8 ms/layer as ``broadcast_multiply_fusion``) and
    then pays two more [N, in, B] passes adding it into the projection's
    input cotangent. Differentiated together, the broadcast rides the
    projection-backward GEMM's output epilogue —

        dg4 = s4 ⊙ (dy @ wᵀ + broadcast_u→(u,v)(dpool)/grp)

    one fused pass over [N, in, B] instead of three. dW is the
    reassociated single GEMM from ``folded_proj`` (the pool has no
    weights). Caller guarantees ``g4.shape[1] == w.shape[1] * grp``.

    MEASURED DEAD END at flagship scale (kept for other geometries /
    future schedules): wiring this into FoldedMixLinear made the v5e
    flagship step 131.6 ms vs 130.5 with the separate autodiff pool —
    twice, with matching slope fits. XLA's default schedule already
    fuses the pool-cotangent broadcast + add efficiently; forcing it
    into the projection-backward GEMM's consumer chain hurt the GEMM's
    own schedule more than the saved pass gained. Grad parity with the
    separate path (w.r.t. g4 and w; s4 is a non-differentiable sign
    buffer here, as in ``folded_proj``) is pinned by
    tests/test_folded_mix.py::
    test_folded_proj_pool_combined_vjp_matches_autodiff.
    """
    y = jnp.einsum("neb,neo->nbo", g4, s4[:, :, None] * w[None])
    n, e, b = g4.shape
    o = e // grp
    pool = jnp.einsum("nuvb,nuv->nbu", g4.reshape(n, o, grp, b),
                      s4.reshape(n, o, grp) / grp)
    return y, pool


def _fwd_folded_proj_pool(g4, w, s4, grp):
    return folded_proj_pool(g4, w, s4, grp), (g4, w, s4)


def _bwd_folded_proj_pool(grp, res, cts):
    g4, w, s4 = res
    dy, dpool = cts
    n, e, b = g4.shape
    o = e // grp
    # the pool cotangent broadcast fuses into the GEMM-output add + sign
    # multiply: one [n, e, b] pass (no standalone broadcast_multiply_fusion)
    dpb = jnp.broadcast_to(
        (dpool.transpose(0, 2, 1) / grp)[:, :, None, :],
        (n, o, grp, b)).reshape(n, e, b)
    dg4 = s4[:, :, None] * (jnp.einsum("nbo,eo->neb", dy, w) + dpb)
    sg = s4[:, :, None] * g4
    # same s4 convention as _bwd_folded_proj: the signs are untrained ±1
    # buffers, cotangent deliberately zero.
    return dg4, _folded_dw(sg, dy, w), jnp.zeros_like(s4)


folded_proj_pool.defvjp(_fwd_folded_proj_pool, _bwd_folded_proj_pool)


@jax.custom_vjp
def perm_rows_t(xt: jnp.ndarray, perms: jnp.ndarray) -> jnp.ndarray:
    """Sign-FREE multi-head row permutation, token-major: [d, B] -> [H*d, B].

    Row ``h*d + i`` of the output is ``xt[perms[h, i], :]``. This is the mix
    op with the +-1 signs REMOVED — the folded formulation
    (models/layers.py::FoldedMixLinear) multiplies the signs into the
    projection/pool weights instead (they are diagonal-linear, so the fold is
    exact), which deletes two full [B, H, d] HBM passes per layer (fwd sign
    multiply + bwd sign multiply) from the activation path.

    Reference semantics context: layers.py:68-73 — x[:, perms] * signs; here
    the gather half only.
    """
    return jnp.take(xt, perms.reshape(-1), axis=0, mode="clip")


def _fwd_rows(xt, perms):
    return perm_rows_t(xt, perms), perms


def _bwd_rows(perms, g):
    h, d = perms.shape
    # Per-head inverse gathers instead of one flat [H*d]-row take: each head
    # reads randomly within ONE 68 MB head slice of g instead of across the
    # whole 1.09 GB stream, which keeps HBM row-buffer locality. Measured
    # (benchmarks/bwd_gather_variants.py, v5e, flagship shape): flat 12.7 ms,
    # per-head chain 11.0 ms; the vmap'd take + reduce variant matches flat.
    inv = jnp.argsort(perms, axis=-1)
    gh = g.reshape(h, d, -1)
    dxt = jnp.take(gh[0], inv[0], axis=0, mode="clip")
    for i in range(1, h):
        dxt = dxt + jnp.take(gh[i], inv[i], axis=0, mode="clip")
    return (dxt, np.zeros(perms.shape, dtype=jax.dtypes.float0))


perm_rows_t.defvjp(_fwd_rows, _bwd_rows)


# ---------------------------------------------------------------------------
# Clos-routed backward (ops/routing.py): the inverse permutation applied as
# 3 stages of one-hot MXU contractions instead of a random row gather —
# sidesteps the (8,128) HBM tile amplification entirely. The route tables
# are host-side data derived from the CONCRETE permutation buffers, so they
# cannot be computed inside the traced backward; callers register them once
# (register_mix_routes, after init/restore, BEFORE the first jitted step)
# under the mix module's static scope path, and the keyed op looks them up
# at trace time. Unregistered keys fall back to the per-head chain above.

_MIX_ROUTES: dict[str, tuple] = {}


def _walk_mix_tables(variables):
    """Yield ``(scope_path_tuple, perms)`` for every ``mix_tables`` buffer in
    a flax variable tree (the registration walk shared by both registries)."""

    def walk(tree, path):
        if not isinstance(tree, dict):
            return
        for k, v in tree.items():
            if k == "mix_tables" and isinstance(v, (tuple, list)):
                yield path, v[0]
            else:
                yield from walk(v, path + (k,))

    buffers = variables.get("buffers", variables)
    yield from walk(dict(buffers), ())


def register_mix_routes(variables, impl: str = "mxu") -> list[str]:
    """Walk ``variables['buffers']`` for mix permutation tables, factor each
    into its 3-stage route (disk-cached), and register under the owning
    module's scope path. Returns the registered keys.

    MUST be re-run after loading different weights (checkpoint restore or
    torch import) — the routes must describe the live buffer contents; the
    train/distill loops do this right after state creation. Registration
    CLEARS all previously registered routes first (the registry is keyed
    by module scope path, which two different models in one process can
    share — stale entries would silently route with the wrong permutation);
    loops whose config leaves ``mix_routed`` off call ``clear_mix_routes()``
    instead, so a prior model's routes never leak into the next.

    ``impl``: "mxu" (XLA einsums over resident one-hot masks — the default:
    it compiles at every measured scale), "pallas" (fused kernel,
    ops/pallas/routed_gather.py — blocked by a Mosaic batch-dim-unroll
    compiler cliff at the flagship factorization, benchmarks/
    routed_kernel_diag.py; only safe at shapes that diagnostic clears),
    or "takes" (chained XLA takes, measurement baseline).
    """
    from spectre_tpu.ops.routing import build_route_tables_cached, pick_factor

    clear_mix_routes()

    keys = []
    for path, perms in _walk_mix_tables(variables):
        perms = np.asarray(perms)
        if perms.ndim != 2 or not pick_factor(perms.shape[1]):
            continue
        d = perms.shape[1]
        if not (perms.min() == 0 and perms.max() == d - 1
                and all(np.bincount(row, minlength=d).max() == 1
                        for row in perms)):
            continue  # not full permutations (e.g. structured tile tables)
        inv = np.argsort(perms, axis=-1).astype(np.int32)
        key = "/".join(path)
        _MIX_ROUTES[key] = (build_route_tables_cached(inv), impl,
                            jnp.asarray(perms))
        keys.append(key)
    return keys


def clear_mix_routes() -> None:
    _MIX_ROUTES.clear()


def register_block_mix_routes(variables, min_blk: int = 8,
                              mesh=None, batch_axis: str = "data") -> list[str]:
    """Walk ``variables['buffers']`` for mix permutation tables that are
    BLOCK-structured (make_block_mix_tables — rows move in whole blk-row
    blocks, blk >= min_blk) and register a block-DMA backward route for
    each: the custom-VJP backward then runs the full-bandwidth Pallas block
    gather (ops/pallas/bwd_gather.py::block_gather_sum_pallas) instead of
    the 8x-tile-amplified per-head row takes. Uniform permutations are left
    untouched (detection returns 0). Same re-registration contract as
    ``register_mix_routes`` (clears first; re-run after restore/import).

    ``mesh``/``batch_axis``: when training over a multi-device mesh, pass
    them — the Pallas kernel is a single-chip op with no GSPMD partitioning
    rule, so the backward runs it under ``shard_map`` over the cotangent's
    batch (minor) axis: each device gathers its own [H*d, B/n] columns,
    zero collectives (the row permutation never crosses the batch axis).
    """
    from spectre_tpu.ops.permute import detect_block_size

    clear_mix_routes()
    if mesh is not None and mesh.size == 1:
        mesh = None  # single-device mesh: the plain call partitions trivially

    keys = []
    for path, perms in _walk_mix_tables(variables):
        perms = np.asarray(perms)
        if perms.ndim != 2:
            continue
        blk = detect_block_size(perms, min_blk=min_blk)
        if not blk:
            continue
        h, d = perms.shape
        bsrc = (perms[:, ::blk] // blk).astype(np.int32)  # [H, d/blk] fwd
        binv = np.argsort(bsrc, axis=-1).astype(np.int32)  # block-level inv
        key = "/".join(path)
        _MIX_ROUTES[key] = ((jnp.asarray(binv), jnp.asarray(bsrc), blk,
                             (h, d), mesh, batch_axis), "block",
                            jnp.asarray(perms))
        keys.append(key)
    return keys


def _rows_fwd_impl(xt, perms, route_key):
    """The keyed forward: the flat XLA take, or — when a block route is
    registered (round 4) — the VMEM-resident-source Pallas block copy
    (ops/pallas/bwd_gather.py::block_scatter_rows_pallas; measured 1.84 vs
    2.06 ms/layer at flagship shape, benchmarks/fwd_gather_variants.py),
    guarded by the same live-buffer equality cond as the backward so a
    stale route degrades to the exact take instead of copying the wrong
    blocks."""
    ent = _MIX_ROUTES.get(route_key) if route_key is not None else None
    if (ent is not None and ent[1] == "block"
            and ent[0][3] == perms.shape
            and xt.shape[-1] % 128 == 0):  # lane-aligned batch only
        binv, bsrc, blk, shape, mesh, batch_axis = ent[0]
        reg_perms = ent[2]
        from spectre_tpu.ops.pallas.bwd_gather import block_scatter_rows_pallas

        if mesh is None:
            routed = lambda xx: block_scatter_rows_pallas(xx, bsrc, blk)
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            sm = shard_map(
                lambda xx, bs: block_scatter_rows_pallas(xx, bs, blk),
                mesh=mesh,
                in_specs=(P(None, batch_axis), P(None, None)),
                out_specs=P(None, batch_axis), check_vma=False)
            routed = lambda xx: sm(xx, bsrc)
        return jax.lax.cond(
            jnp.array_equal(perms, reg_perms), routed,
            lambda xx: jnp.take(xx, perms.reshape(-1), axis=0, mode="clip"),
            xt)
    return jnp.take(xt, perms.reshape(-1), axis=0, mode="clip")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def perm_rows_t_keyed(xt: jnp.ndarray, perms: jnp.ndarray,
                      route_key: str | None) -> jnp.ndarray:
    """``perm_rows_t`` with a static identity for route lookup.

    Both directions consult the registry: the forward runs the block-copy
    kernel when a block route is registered (bit-exact vs the take — it
    moves the same rows), the backward the registered Clos/block route
    (bitwise-identical result to the per-head chain: per-head pass-through
    is exact and the head accumulation runs in the same order and dtype),
    else the per-head gather chain.
    """
    return _rows_fwd_impl(xt, perms, route_key)


def _fwd_rows_keyed(xt, perms, route_key):
    return _rows_fwd_impl(xt, perms, route_key), perms


def _bwd_rows_keyed(route_key, perms, g):
    # NOTE: ``is not None`` — a TOP-LEVEL mix module has scope path () and
    # therefore route_key "" (falsy), which must still hit the registry
    ent = _MIX_ROUTES.get(route_key) if route_key is not None else None
    routed = None
    if ent is not None:
        rt, impl, reg_perms = ent
        if impl == "block":
            binv, bsrc, blk, shape, mesh, batch_axis = rt
            if shape == perms.shape:
                from spectre_tpu.ops.pallas.bwd_gather import (
                    block_gather_sum_pallas)

                if mesh is None:
                    routed = lambda gg: block_gather_sum_pallas(gg, binv, blk)
                else:
                    # multi-device: the kernel has no GSPMD rule — run it
                    # per-device on the batch (minor-axis) shard; the row
                    # permutation is batch-independent, so no collectives
                    from jax import shard_map
                    from jax.sharding import PartitionSpec as P

                    sm = shard_map(
                        lambda gg, bi: block_gather_sum_pallas(gg, bi, blk),
                        mesh=mesh,
                        in_specs=(P(None, batch_axis), P(None, None)),
                        out_specs=P(None, batch_axis), check_vma=False)
                    routed = lambda gg: sm(gg, binv)
        elif rt.a_idx.shape[:1] + (rt.r * rt.c,) == perms.shape:
            if impl == "pallas":
                from spectre_tpu.ops.pallas.routed_gather import (
                    routed_gather_sum_pallas)

                routed = lambda gg: routed_gather_sum_pallas(gg, rt)
            elif impl == "mxu":
                from spectre_tpu.ops.routing import (route_gather_sum_mxu,
                                                     route_onehots)

                oh = route_onehots(rt, g.dtype)
                routed = lambda gg: route_gather_sum_mxu(gg, *oh)
            else:
                from spectre_tpu.ops.routing import route_gather_sum

                routed = lambda gg: route_gather_sum(gg, rt)
    if routed is None:
        return _bwd_rows(perms, g)
    # Routes are host-side data keyed by scope path + shape, which a SECOND
    # same-geometry model in one process can share without re-registering —
    # guard the registered table against the LIVE traced buffers so a stale
    # route degrades to the exact per-head chain instead of silently applying
    # the wrong inverse permutation. The compare is one [H, d] int pass
    # (~1 MB at flagship — noise next to the multi-ms gather it guards).
    dxt = jax.lax.cond(jnp.array_equal(perms, reg_perms), routed,
                       lambda gg: _bwd_rows(perms, gg)[0], g)
    return (dxt, np.zeros(perms.shape, dtype=jax.dtypes.float0))


perm_rows_t_keyed.defvjp(_fwd_rows_keyed, _bwd_rows_keyed)
