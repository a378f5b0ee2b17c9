"""Clos/Benes routing decomposition of the fixed mix permutations.

The mix backward's hot op is ``dxt[j] = sum_h g[h*d + inv[h, j]]`` — a
random ROW gather over the [H*d, B] cotangent stream. TPU HBM arrays are
(8, 128)-tiled, so any engine (XLA's gather unit or a Pallas DMA) that
moves one logical [1, B] row pays for the aligned 8-row block: an
unavoidable ~8x read amplification that pins the op at ~11 ms/layer on the
flagship shape (BASELINE.md; ops/pallas/bwd_gather.py measured the DMA
variant of the same floor).

This module sidesteps the amplification ALGEBRAICALLY. Each ``inv[h]`` is
a full permutation (every source row is consumed exactly once), and any
permutation of r*c elements factors — by Hall's theorem, the Slepian–Duguid
rearrangeability argument for 3-stage Clos networks — into

    within-row mix  ->  cross-row (per-column) mix  ->  within-row mix

over an [r, c] matrix view. Each stage is a batch of small DENSE one-hot
contractions (c x c or r x r), i.e. MXU matmuls over contiguous tiles plus
streaming reads — no sub-tile access anywhere, so the 8x tile penalty
vanishes. One-hot matmuls pass values through bit-exactly (1.0*v summed
with zeros) in any dtype; the head reduction accumulates in f32 on the MXU.

The factorization is computed HOST-SIDE from the concrete permutation
tables (they are fixed buffers, reference spectre/layers.py:53-60) by
Euler-split edge colouring: the bipartite multigraph {source row-block ->
dest row-block, one edge per element} is c-regular; halving it
recursively along Euler circuits yields c perfect matchings = the c
"columns" of the route. O(d log c), runs once per (layer, head) at setup.

Used by benchmarks/bwd_gather_variants.py (--routed) to settle VERDICT r2
item #4 with measurements, and by ops/pallas/routed_gather.py for the fused
in-VMEM kernel.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


def _euler_split(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """2-colour the edges of an even-regular bipartite multigraph so each
    vertex (either side) gets exactly half of each colour.

    Walks Euler circuits (Hierholzer), alternating colours along each; a
    circuit in a bipartite graph has even length and visits each vertex via
    edge PAIRS, so the alternation splits every vertex's edges evenly.
    """
    m = len(src)
    color = np.zeros(m, dtype=np.int8)
    used = np.zeros(m, dtype=bool)
    # adjacency: edge lists per left/right node + a moving cursor
    order_l = np.argsort(src, kind="stable")
    order_r = np.argsort(dst, kind="stable")
    n_l = int(src.max()) + 1 if m else 0
    n_r = int(dst.max()) + 1 if m else 0
    start_l = np.searchsorted(src[order_l], np.arange(n_l))
    start_r = np.searchsorted(dst[order_r], np.arange(n_r))
    ptr_l = start_l.copy()
    ptr_r = start_r.copy()
    end_l = np.searchsorted(src[order_l], np.arange(n_l), side="right")
    end_r = np.searchsorted(dst[order_r], np.arange(n_r), side="right")

    for e0 in range(m):
        if used[e0]:
            continue
        e, col, at_left = e0, 0, True  # departing from the left endpoint
        while True:
            used[e] = True
            color[e] = col
            col ^= 1
            # land on the other endpoint; depart via its next unused edge
            if at_left:
                node, order, ptr, end = dst[e], order_r, ptr_r, end_r
            else:
                node, order, ptr, end = src[e], order_l, ptr_l, end_l
            i = ptr[node]
            while i < end[node] and used[order[i]]:
                i += 1
            ptr[node] = i
            if i == end[node]:
                break  # circuit closed (all-even degrees: only at the start)
            e = order[i]
            at_left = not at_left
    return color


def edge_color(src: np.ndarray, dst: np.ndarray, k: int) -> np.ndarray:
    """Colour the edges of a k-regular bipartite multigraph with k colours
    such that each (vertex, colour) pair occurs exactly once. k power of 2.
    """
    if k == 1:
        return np.zeros(len(src), dtype=np.int32)
    if k & (k - 1):
        raise ValueError(f"edge_color needs a power-of-two regularity, got {k}")
    half = _euler_split(src, dst)
    out = np.empty(len(src), dtype=np.int32)
    for b in (0, 1):
        m = half == b
        out[m] = 2 * edge_color(src[m], dst[m], k // 2) + b
    return out


def pick_factor(d: int, c_max: int = 128) -> int:
    """Largest power-of-two column count c <= c_max with c | d (and c >= 8),
    or 0 if d has no usable power-of-two factor."""
    c = d & (-d)  # largest power of 2 dividing d
    c = min(c, c_max)
    return c if c >= 8 else 0


@dataclass(frozen=True)
class RouteTables:
    """Per-head 3-stage route for ``y[j] = sum_h g[h*d + inv[h, j]]``.

    With the [d] axis viewed as [r, c] (q = i // c, s = i % c):
      stage A: out1[h, q, t] = g[h, q, a_idx[h, q, t]]      (within-row)
      stage B: out2[h, q, t] = out1[h, b_idx[h, q, t], t]   (cross-row)
      stage C: y[q, s]       = sum_h out2[h, q, c_idx[h, q, s]]
    """

    r: int
    c: int
    a_idx: np.ndarray  # [H, r, c] int32
    b_idx: np.ndarray  # [H, r, c] int32
    c_idx: np.ndarray  # [H, r, c] int32


def build_route_tables(inv: np.ndarray, c: int | None = None) -> RouteTables:
    """Factor each head's inverse permutation into the 3-stage route.

    ``inv``: [H, d] int array, each row a permutation of range(d) — the
    SOURCE row of output row j is inv[h, j] (within head h's slice).
    """
    inv = np.asarray(inv)
    h_n, d = inv.shape
    c = pick_factor(d) if c is None else c
    if not c or d % c:
        raise ValueError(f"no usable power-of-two factor for d={d} (c={c})")
    r = d // c
    j = np.arange(d)
    qd, sd = j // c, j % c
    a_idx = np.empty((h_n, r, c), dtype=np.int32)
    b_idx = np.empty((h_n, r, c), dtype=np.int32)
    c_idx = np.empty((h_n, r, c), dtype=np.int32)
    for h in range(h_n):
        sig = inv[h]
        qs, ss = sig // c, sig % c
        t = edge_color(qs, qd, c)
        a_idx[h, qs, t] = ss
        b_idx[h, qd, t] = qs
        c_idx[h, qd, sd] = t
    return RouteTables(r=r, c=c, a_idx=a_idx, b_idx=b_idx, c_idx=c_idx)


def build_route_tables_cached(inv: np.ndarray,
                              c: int | None = None) -> RouteTables:
    """Disk-cached ``build_route_tables`` (the Euler colouring costs ~7 s
    per flagship layer; the tables are pure functions of the permutations).
    Cache: ~/.cache/spectre_tpu_routes/<sha1 of inv bytes>.npz."""
    import hashlib
    import os

    inv = np.ascontiguousarray(np.asarray(inv, dtype=np.int32))
    tag = hashlib.sha1(inv.tobytes()
                       + str(c).encode()).hexdigest()  # noqa: S324 (cache key)
    cdir = os.path.join(os.path.expanduser("~"), ".cache",
                        "spectre_tpu_routes")
    path = os.path.join(cdir, f"{tag}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return RouteTables(r=int(z["r"]), c=int(z["c"]), a_idx=z["a"],
                           b_idx=z["b"], c_idx=z["cc"])
    rt = build_route_tables(inv, c)
    os.makedirs(cdir, exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:  # np.savez would append .npz to a bare path
        np.savez(f, r=rt.r, c=rt.c, a=rt.a_idx, b=rt.b_idx, cc=rt.c_idx)
    os.replace(tmp, path)
    return rt


def route_gather_sum(g: jnp.ndarray, rt: RouteTables) -> jnp.ndarray:
    """Reference/jnp application of the 3-stage route (take_along_axis form).

    Bit-identical to the direct gather-sum up to head-summation order
    (sums heads the same way: a single sum over the leading axis).
    """
    h, r, c = rt.a_idx.shape
    gv = g.reshape(h, r, c, -1)
    out1 = jnp.take_along_axis(gv, jnp.asarray(rt.a_idx)[..., None], axis=2)
    out2 = jnp.take_along_axis(out1, jnp.asarray(rt.b_idx)[..., None], axis=1)
    y = jnp.take_along_axis(out2, jnp.asarray(rt.c_idx)[..., None], axis=2)
    return y.sum(axis=0).reshape(r * c, -1)


def route_onehots(rt: RouteTables, dtype=jnp.bfloat16):
    """Dense one-hot stage operators for the MXU/einsum formulation.

    oh_a [H, r, c, c]: oh_a[h,q,t,s] = 1 iff a_idx[h,q,t] == s
    oh_b [H, c, r, r]: oh_b[h,t,q,p] = 1 iff b_idx[h,q,t] == p
    oh_c [H, r, c, c]: oh_c[h,q,s,t] = 1 iff c_idx[h,q,s] == t

    ~0.5 GiB bf16 at the flagship shape — intended to be built ONCE and
    kept resident (they are constants of the fixed permutations).
    """
    ar = np.arange
    oh_a = (rt.a_idx[..., None] == ar(rt.c)).astype(dtype)
    oh_b = (np.swapaxes(rt.b_idx, 1, 2)[..., None] == ar(rt.r)).astype(dtype)
    oh_c = (rt.c_idx[..., None] == ar(rt.c)).astype(dtype)
    return jnp.asarray(oh_a), jnp.asarray(oh_b), jnp.asarray(oh_c)


def route_gather_sum_mxu(g: jnp.ndarray, oh_a, oh_b, oh_c) -> jnp.ndarray:
    """One-hot einsum (MXU) application of the 3-stage route.

    Values pass through one-hot matmuls bit-exactly; the final einsum
    contracts (head, colour) jointly, accumulating the head sum in f32.
    """
    h, r, c, _ = oh_a.shape
    gv = g.reshape(h, r, c, -1)
    out1 = jnp.einsum("hqts,hqsb->hqtb", oh_a, gv)
    out2 = jnp.einsum("htqp,hptb->hqtb", oh_b, out1)
    y = jnp.einsum("hqst,hqtb->qsb", oh_c, out2)
    return y.reshape(r * c, -1).astype(g.dtype)
