"""Performance measurement harnesses.

Capability parity with the reference benchmark scripts (SURVEY.md §6):

- ``latency``   end-to-end SpectreViT forward latency sweep over
                patch x heads (reference test.py:31-62 — including fixing its
                bug of printing sweep vars while benchmarking the config
                model; here the swept values are actually used)
- ``linear``    SpectreLinear vs plain Dense timing across dims 2^8..2^12
                (test.py:65-152), incl. param counts
- ``mixer``     MHPermutMix (gather + structured + Pallas) vs FFT2 mixing
                time across dims (orthogonal_permut.py:76-134)
- ``encoder``   one SpectreEncoderLayer step under jax.profiler ->
                ProfilerParser table + plots/encoder_layer.csv
                (test.py:154-179)
- ``attention`` flash_attention kernel vs XLA einsum, forward AND fwd+bwd
                (the explicit LSE-residual flash backward's decision row)
- ``train``     full train-step throughput for a config, Pallas on/off and
                gather/structured — the tuning harness for bench.py

    python -m spectre_tpu.repl.perf latency|linear|mixer|encoder|attention|train [--config ...]
"""

from __future__ import annotations

import argparse
import itertools
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _time_fn(fn, *args, warmup=5, iters=50):
    """Two-point slope timing with a scalar-fetch barrier.

    On this runtime ``block_until_ready`` does NOT block on independent
    (non-donated) dispatch chains — round-1's per-op numbers timed dispatch,
    not execution (BASELINE.md "Retraction"). The device executes in-order,
    so fetching a derived SCALAR after N dispatches syncs on all N; the
    slope between two N values cancels the constant ~30 ms tunnel fetch
    latency and any remaining dispatch overhead.
    """
    red = jax.jit(lambda o: jnp.sum(
        jax.tree.leaves(o)[0].astype(jnp.float32)))
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(red(out)))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        float(np.asarray(red(out)))
        return time.perf_counter() - t0

    iters = max(iters, 2)  # slope needs two distinct window sizes
    n1 = min(max(2, iters // 5), iters - 1)
    t1, t2 = run(n1), run(iters)
    return max((t2 - t1) / (iters - n1), 1e-9)


def _dispatch_floor(iters=200):
    """Per-dispatch wall-clock floor of this runtime (slope of a trivial op).
    Measurements at/below this are dispatch-bound: the device finishes
    before the host can issue the next call, so the true kernel time is
    SMALLER than reported — report them as '<= floor'."""
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    return _time_fn(f, x, warmup=10, iters=iters)


def _fmt(dt, floor):
    ms = dt * 1e3
    return (f"<= {ms:.3f} ms (dispatch-bound)" if dt <= floor * 1.5
            else f"{ms:.3f} ms")


def cmd_latency(args):
    from spectre_tpu.models import SpectreViT

    b = args.batch
    print(f"SpectreViT forward latency (B={b}, {args.warmup} warmup + {args.iters} iters)")
    for patch, heads in itertools.product([4, 8], [1, 2, 4, 8]):
        model = SpectreViT(img_size=32, patch_size=patch, in_channels=3,
                           num_classes=100, embed_dim=args.embed_dim,
                           num_encoders=4, num_heads=heads,
                           hidden_dim=args.embed_dim, dropout=0.0,
                           mix_impl=args.mix_impl, use_pallas=args.use_pallas)
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (b, 3, 32, 32)).astype(np.float32))
        variables = model.init(jax.random.key(0), x)
        fwd = jax.jit(lambda v, xx: model.apply(v, xx))
        dt = _time_fn(fwd, variables, x, warmup=args.warmup, iters=args.iters)
        print(f"  patch={patch} heads={heads}: {dt * 1e3:.3f} ms/iter "
              f"({b / dt:.0f} img/s)")


def cmd_linear(args):
    import flax.linen as nn

    from spectre_tpu.models.layers import SpectreLinear

    floor = _dispatch_floor()
    print(f"SpectreLinear vs nn.Dense (square dims), avg ms/iter "
          f"(dispatch floor {floor * 1e3:.3f} ms)")
    for p in range(8, 13):
        dim = 2 ** p
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (args.batch, dim)).astype(np.float32))
        sl = SpectreLinear(dim, use_pallas=args.use_pallas)
        dense = nn.Dense(dim)
        vs, vd = sl.init(jax.random.key(0), x), dense.init(jax.random.key(0), x)
        n_sl = sum(int(a.size) for a in jax.tree.leaves(vs))
        n_d = sum(int(a.size) for a in jax.tree.leaves(vd))
        t_sl = _time_fn(jax.jit(lambda v, xx: sl.apply(v, xx)), vs, x,
                        warmup=args.warmup, iters=args.iters)
        t_d = _time_fn(jax.jit(lambda v, xx: dense.apply(v, xx)), vd, x,
                       warmup=args.warmup, iters=args.iters)
        print(f"  dim={dim}: spectre {_fmt(t_sl, floor)} ({n_sl:,} params) | "
              f"dense {_fmt(t_d, floor)} ({n_d:,} params)")


def cmd_mixer(args):
    from spectre_tpu.ops import (
        fft2_real_matmul, make_mix_tables, make_structured_tables,
        permut_mix, structured_mix)
    from spectre_tpu.ops.pallas import (pallas_path_taken,
                                        structured_mix_pallas, use_interpret)

    heads = args.heads
    floor = _dispatch_floor()
    print(f"mixing time, H={heads}, avg ms/iter (dims 2^6..2^{args.max_pow}; "
          f"dispatch floor {floor * 1e3:.3f} ms)")
    for p in range(6, args.max_pow + 1):
        d = 2 ** p
        n = 8  # tokens; embed = d // n
        if d // n < 8:
            continue
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (args.batch, n, d // n)).astype(np.float32))
        perms, signs = make_mix_tables(jax.random.key(0), heads, d)
        tperms, ssigns = make_structured_tables(jax.random.key(0), heads, d)

        t_g = _time_fn(jax.jit(partial(permut_mix, token_dim=n)), x, perms, signs,
                       warmup=args.warmup, iters=args.iters)
        t_s = _time_fn(jax.jit(partial(structured_mix, token_dim=n)), x, tperms,
                       ssigns, warmup=args.warmup, iters=args.iters)
        t_f = _time_fn(jax.jit(fft2_real_matmul), x,
                       warmup=args.warmup, iters=args.iters)
        row = (f"  d={d}: gather {_fmt(t_g, floor)} | "
               f"structured {_fmt(t_s, floor)} | fft2 {_fmt(t_f, floor)}")
        if not use_interpret():
            t_sp = _time_fn(
                jax.jit(partial(structured_mix_pallas, token_dim=n)),
                x, tperms, ssigns, warmup=args.warmup, iters=args.iters)
            # sub-tile shapes silently reroute to the XLA formulation
            # (structured_mix.py) — label them so 'pallas' rows never
            # secretly report XLA numbers
            tag = ("structured-pallas" if
                   pallas_path_taken(args.batch, d, int(tperms.shape[1]))
                   else "structured-pallas(xla-fallback)")
            row += f" | {tag} {_fmt(t_sp, floor)}"
        print(row)


def cmd_attention(args):
    """flash_attention (Pallas, fused fwd + flash bwd) vs the XLA einsum
    reference, forward-only AND fwd+bwd — the training-relevant number
    (the round-2 kernel's backward re-ran the forward; this measures the
    explicit LSE-residual backward)."""
    from spectre_tpu.ops.pallas import use_interpret
    from spectre_tpu.ops.pallas.attention import _reference, flash_attention

    floor = _dispatch_floor()
    b, h, dd = args.batch, args.heads, 64
    print(f"attention B={b} H={h} D={dd} bf16, avg ms/iter "
          f"(dispatch floor {floor * 1e3:.3f} ms)"
          + (" [INTERPRET — not a perf run]" if use_interpret() else ""))
    rng = np.random.default_rng(0)
    for n in (65, 256, 1024):
        q, k, v, w = (jnp.asarray(rng.standard_normal((b, h, n, dd)),
                                  jnp.bfloat16) for _ in range(4))

        for name, fn in (("pallas", flash_attention), ("xla", _reference)):
            fwd = jax.jit(lambda q_, k_, v_, f=fn: f(q_, k_, v_))
            gfn = jax.jit(jax.grad(
                lambda q_, k_, v_, f=fn: jnp.sum(
                    (w * f(q_, k_, v_)).astype(jnp.float32)),
                argnums=(0, 1, 2)))
            t_f = _time_fn(fwd, q, k, v, warmup=args.warmup, iters=args.iters)
            t_b = _time_fn(gfn, q, k, v, warmup=args.warmup, iters=args.iters)
            print(f"  N={n} {name}: fwd {_fmt(t_f, floor)} | "
                  f"fwd+bwd {_fmt(t_b, floor)}")


def cmd_encoder(args):
    from spectre_tpu.models.spectre import SpectreEncoderLayer
    from spectre_tpu.profile import ProfilerParser, trace_step

    layer = SpectreEncoderLayer(seq_length=65, d_model=args.embed_dim,
                                nhead=args.heads, dim_feedforward=args.embed_dim,
                                dropout=0.0, mix_impl=args.mix_impl,
                                use_pallas=args.use_pallas)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, 65, args.embed_dim)).astype(np.float32))
    variables = layer.init(jax.random.key(0), x)
    fwd = jax.jit(lambda v, xx: layer.apply(v, xx))
    jax.block_until_ready(fwd(variables, x))  # compile outside trace
    with trace_step("plots/encoder_trace") as t:
        jax.block_until_ready(fwd(variables, x))
    (ProfilerParser(t.path).remove_idle().add_percentages().round()
     .sort_by_device().head(25).show().to_csv("plots/encoder_layer.csv"))
    print("wrote plots/encoder_layer.csv")


def cmd_train(args):
    from spectre_tpu.configs import parse_config
    from spectre_tpu.data import make_train_augment
    from spectre_tpu.models import build_model
    from spectre_tpu.repl.train import apply_overrides
    from spectre_tpu.train import create_train_state, make_optimizer, make_train_step
    from spectre_tpu.train.loop import _dataset_stats

    for use_pallas, mix_impl in itertools.product(
            [False, True], ["gather", "folded", "structured"]):
        cfg = apply_overrides(parse_config(args.config), args.set)
        cfg.use_pallas, cfg.mix_impl = use_pallas, mix_impl
        model = build_model(cfg)
        b = int(cfg.batch_size)
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.uniform(
            0, 1, (b, cfg.in_channels, cfg.img_size, cfg.img_size)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, cfg.num_classes, b).astype(np.int32))
        tx = make_optimizer(cfg, 195)
        state = create_train_state(model, tx, images)
        # dataset-appropriate stats/pipeline (a hard-coded CIFAR augment
        # crashed on 1-channel MNIST configs) — EXACTLY train/loop.py's
        # selection, so the timed program is the trainer's program
        # (reference MNIST = RandomRotation(15) only)
        dataset = getattr(cfg, "dataset", "mnist")
        mean, std = _dataset_stats(dataset)
        if dataset == "mnist":
            augment = make_train_augment(mean, std, hflip=False,
                                         jitter=False, grayscale_p=0.0,
                                         degrees=15.0, blur_p=0.0,
                                         erasing_p=0.0)
        else:
            augment = make_train_augment(mean, std,
                                         jitter=(cfg.in_channels == 3))
        step = make_train_step(model, augment_fn=augment)

        # donated-state chains serialize dispatch, so an end-of-loop scalar
        # fetch is a truthful barrier here (bench.py uses the same method) —
        # but a SINGLE window still carries the constant ~30 ms tunnel fetch
        # in its average; two-point slope timing cancels it (the repo-wide
        # discipline, _time_fn/bench.py)
        for _ in range(args.warmup):
            state, m = step(state, images, labels)
        np.asarray(m["loss"])
        # slope needs two distinct window sizes: clamp so --iters <= 2
        # still measures (an n1=0 window is a pure fetch, which the slope
        # cancels) instead of dividing by zero
        n1 = min(max(2, args.iters // 5), max(0, args.iters - 1))
        times = []
        for n in (n1, args.iters):
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = step(state, images, labels)
            np.asarray(m["loss"])
            times.append(time.perf_counter() - t0)
        dt = (times[1] - times[0]) / (args.iters - n1)
        print(f"  pallas={int(use_pallas)} mix={mix_impl}: {dt * 1e3:.2f} ms/step "
              f"({b / dt:.0f} img/s)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("cmd", choices=["latency", "linear", "mixer", "encoder",
                                   "attention", "train"])
    p.add_argument("--config", default="spectre_tpu/configs/spectre_vit_cifar100.py")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--embed-dim", dest="embed_dim", type=int, default=512)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--max-pow", dest="max_pow", type=int, default=13)
    p.add_argument("--mix-impl", dest="mix_impl", default="gather")
    p.add_argument("--use-pallas", dest="use_pallas", action="store_true")
    p.add_argument("--set", nargs="*", default=[])
    args = p.parse_args(argv)
    {"latency": cmd_latency, "linear": cmd_linear, "mixer": cmd_mixer,
     "encoder": cmd_encoder, "attention": cmd_attention,
     "train": cmd_train}[args.cmd](args)


if __name__ == "__main__":
    main()
