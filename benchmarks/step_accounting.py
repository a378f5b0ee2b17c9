"""FULL per-op accounting of the flagship train step (VERDICT r3 #2).

Round 3 committed only 40-row CSV heads, leaving ~43 ms/step of the
130.5 ms step invisible and the three biggest non-GEMM fusion families
unattributed. This harness closes both gaps for bench.py's EXACT program
(flagship config, B=1024, block mix routes, device-side augmentation):

1. writes the COMPLETE per-op table (every tracked instruction, no head)
   to ``benchmarks/v5e_train_step_ops_r4_full.csv.gz``;
2. attributes every fusion to model ops by joining the trace against the
   compiled HLO's own metadata: each fused instruction carries
   ``metadata={op_name="jit(train_step)/<jax scope path>"}`` where the
   scope path includes the flax module names (``encoder/layers_2/mix``,
   ``patch_embed``, optimizer update, augmentation, ...) — ground truth,
   not guesswork;
3. buckets the step into named categories (GEMMs, mix gathers, layernorm,
   GELU, augmentation, optimizer, loss, ...) covering >=95% of device
   time, written to ``benchmarks/v5e_train_step_buckets_r4.csv``;
4. computes a per-instruction ROOFLINE floor from the HLO shapes: each op
   is bounded below by max(FLOPs/peak, bytes/HBM-bw); the sum is the
   speed-of-light for this op mix under this schedule, printed next to
   the measured step time.

Run: PYTHONPATH=/root/.axon_site:. python benchmarks/step_accounting.py

CPU smoke (validates the trace->HLO join end-to-end without a chip;
writes to /tmp instead of benchmarks/; the harness hard-codes the CIFAR
augmentation pipeline, so --config must stay a 3-channel CIFAR config):
  JAX_PLATFORMS=cpu python benchmarks/step_accounting.py --batch 8 --smoke
"""

from __future__ import annotations

import argparse
import gzip
import os
import re
import sys
from collections import defaultdict

# The axon plugin hooks get_backend and dials the chip tunnel even when
# JAX_PLATFORMS=cpu is exported (it hangs when the tunnel is down), so a
# CPU run must also pin via jax.config before any backend initializes —
# same pattern as convergence_ab.py / tests/conftest.py (ROADMAP r3 #19b).
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.configs import parse_config
from spectre_tpu.data import CIFAR100_MEAN, CIFAR100_STD, make_train_augment
from spectre_tpu.models import build_model
from spectre_tpu.profile import ProfilerParser, trace_step
from spectre_tpu.train import create_train_state, make_optimizer, make_train_step

PEAK_FLOPS = 197e12          # v5e bf16 dense peak
HBM_BW = 819e9               # v5e HBM bandwidth, bytes/s

DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
               "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
               "u64": 8, "c64": 8, "c128": 16}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(type_str: str) -> int:
    """Bytes of an HLO type string, incl. tuple types ('(f32[..], ..)')."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


# the type part is matched lazily up to "opcode(%" / "opcode()" because
# post-layout tuple types nest parens ("(bf16[768]{0:T(1024)(128)(2,1)}, ...,
# /*index=5*/bf16[...])") that a [^)]* alternative cannot cross — the round-4
# first run lost the 8 biggest layernorm-backward fusions (8.8 ms/step)
# exactly this way. Operands in optimized HLO text are always %refs, so
# requiring "(%" (or "()" for zero-operand ops) cannot fire inside a type.
_INSTR_RE = re.compile(
    r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+(.*?)\s+([\w\-]+)\((?:%|\))")
_META_RE = re.compile(r'metadata=\{[^}]*op_name="([^"]*)"')
_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")


def parse_hlo(hlo: str):
    """Parse optimized HLO text.

    Returns (entry: {instr_name: (type_str, opcode, op_name, calls)},
             comp_opnames: {computation_name: [op_name, ...]}).
    """
    entry = {}
    comp_opnames = defaultdict(list)
    cur_comp = None
    for line in hlo.splitlines():
        if line and not line[0].isspace():
            m = re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)\s*(?:\()", line)
            cur_comp = m.group(1) if m else None
            continue
        m = _INSTR_RE.match(line)
        if not m or cur_comp is None:
            continue
        name, type_str, opcode = m.group(1), m.group(2).strip(), m.group(3)
        meta = _META_RE.search(line)
        op_name = meta.group(1) if meta else ""
        calls = _CALLS_RE.search(line)
        entry.setdefault(name, (type_str, opcode, op_name,
                                calls.group(1) if calls else None))
        if op_name:
            comp_opnames[cur_comp].append(op_name)
    return entry, comp_opnames


# bucket rules, first match wins; matched against the CLEANED scope paths
# (jax transform wrappers like "transpose(jvp(SpectreViT))" stripped — the
# backward pass's transform prefix must not hit the relayout rule) of the
# fusion's own op_name plus every op_name inside its fused computation
BUCKET_RULES = [
    ("optimizer (AdamW+cosine)",
     r"adamw|scale_by|opt_state|apply_updates|weight_decay"),
    ("augmentation",
     r"augment|rotate|erasing|color_jitter|grayscale|flip|blur|normalize_img"),
    ("loss (CE+softmax)", r"cross_entropy|log_softmax|softmax|one_hot"),
    ("mix gather/scatter",
     r"perm_rows|block_gather|block_scatter|take|gather|scatter"),
    ("mix fold/sign/route (mix_layer non-GEMM)", r"mix_layer|/mix/|folded"),
    ("layernorm", r"layer_norm|layernorm|LayerNorm|/ln|norm1|norm2|variance"),
    ("GELU", r"gelu|erf"),
    ("patch embed (rfft2 GEMM)", r"patch_embed|embeddings_block|spectral"),
    ("pool residual", r"avg_pool|pool"),
    ("GEMM (dot_general)", r"dot_general|einsum|conv_general"),
]

_TRANSFORM_SEG = re.compile(r"^\w+\(")  # "transpose(jvp(M))", "jvp(M)", ...
_RELAYOUT_PRIM = re.compile(
    r"^(transpose|copy|reshape|bitcast|convert_element_type|squeeze|"
    r"broadcast_in_dim)(\[|$|\.)")


def clean_paths(op_names: list[str]) -> tuple[list[str], list[str]]:
    """Normalize scope paths; return (paths, final primitive names).

    Transform wrapper segments are unwrapped to their innermost name —
    "transpose(jvp(SpectreViT))" -> "SpectreViT" (the backward transform
    prefix must not hit the relayout rule) but "vmap(jit(rotate))" ->
    "rotate" (the wrapped function name is the only handle on augment ops).
    """
    paths, prims = [], []
    for n in op_names:
        s = n.split("jit(train_step)/")[-1]
        parts = []
        for p in s.split("/"):
            while _TRANSFORM_SEG.match(p):
                p = p[p.index("(") + 1:].rstrip(")")
            if p:
                parts.append(p)
        if not parts:
            continue
        paths.append("/".join(parts))
        prims.append(parts[-1])
    return paths, prims


def classify(op_names: list[str], opcode: str) -> str:
    paths, prims = clean_paths(op_names)
    joined = " ".join(paths)
    # GEMM first when the fusion computes a dot — dot fusions carry many
    # epilogue op_names that would otherwise mis-bucket them
    if "dot_general" in joined and ("fusion" in opcode or opcode == "dot"):
        return "GEMM (dot_general)"
    # majority vote over the fused ops' scope paths: XLA fuses ACROSS module
    # boundaries (round-4 first run: encoder layernorm/residual fusions with
    # one stray jit(augment) op inside were swallowed whole by the
    # augmentation bucket — 11 of its 17 ms were encoder work). Each fused
    # op votes for the first rule it matches; the bucket with the most votes
    # wins, rule order breaking ties.
    votes = defaultdict(int)
    for p in paths:
        for bucket, pat in BUCKET_RULES:
            if re.search(pat, p):
                votes[bucket] += 1
                break
    if votes:
        order = {b: i for i, (b, _) in enumerate(BUCKET_RULES)}
        return max(votes, key=lambda b: (votes[b], -order[b]))
    for bucket, pat in BUCKET_RULES:
        if re.search(pat, joined):
            return bucket
    # relayout: decided by the PRIMITIVE names / opcode only — scope-path
    # substring matching would swallow the whole backward pass
    if opcode in ("copy", "transpose", "bitcast", "copy-start", "copy-done"):
        return "transpose/copy/relayout"
    if prims and all(_RELAYOUT_PRIM.match(p) for p in prims):
        return "transpose/copy/relayout"
    if opcode.startswith("all-") or opcode in ("tuple", "get-tuple-element"):
        return "infra"
    return f"other ({opcode})"


def classify_row(name: str, op_names: list[str], opcode: str) -> str:
    bucket = classify(op_names, opcode)
    if bucket == "other (fusion)" and not op_names:
        # no HLO metadata for this trace row (CPU runtime thunk wrappers,
        # renamed instructions): fall back to the fusion's own name
        if re.match(r"(wrapped_)?(convert|copy|transpose|bitcast)", name):
            return "transpose/copy/relayout"
    return bucket


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default="spectre_tpu/configs/spectre_vit_cifar100.py")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--smoke", action="store_true",
                    help="CPU smoke: tiny run, artifacts to /tmp, no "
                         "block-route assertion (small geometries may not "
                         "divide)")
    args = ap.parse_args()
    prefix = "/tmp" if args.smoke else "benchmarks"
    out_full = f"{prefix}/v5e_train_step_ops_r4_full.csv.gz"
    out_buckets = f"{prefix}/v5e_train_step_buckets_r4.csv"

    cfg = parse_config(args.config)
    cfg.batch_size = args.batch
    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=195)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(
        0, 1, (cfg.batch_size, cfg.in_channels, cfg.img_size,
               cfg.img_size)).astype(np.float32))
    labels = jnp.asarray(rng.integers(
        0, cfg.num_classes, cfg.batch_size).astype(np.int32))
    state = create_train_state(model, tx, images, seed=0)
    from spectre_tpu.ops.fused_mix import register_block_mix_routes
    keys = register_block_mix_routes(state.variables())
    if not args.smoke:
        assert getattr(cfg, "mix_block", 0), \
            "flagship config must ship mix_block"
        assert keys, "no block routes registered"
    print(f"block routes registered: {len(keys)}", flush=True)

    step = make_train_step(model, augment_fn=make_train_augment(
        CIFAR100_MEAN, CIFAR100_STD))

    print("lowering + compiling for HLO text ...", flush=True)
    # lower the step's OWN jit (make_train_step already jits with state
    # donation) — wrapping it in a second jax.jit builds a different module
    # whose fusion numbering diverges from the executable the trace runs
    # (round-4 first run: the 8 augmentation multiply_reduce fusions, 13.2
    # ms/step, failed the name join exactly this way)
    compiled = step.lower(state, images, labels).compile()
    hlo = compiled.as_text()
    with open("/tmp/step_hlo_r4.txt", "w") as f:  # debugging aid: the raw
        f.write(hlo)                              # text the join runs against
    entry, comp_opnames = parse_hlo(hlo)
    print(f"parsed {len(entry)} instructions, "
          f"{len(comp_opnames)} computations with metadata", flush=True)

    # warmup on the ORIGINAL step (donation: keep state usable)
    for _ in range(5):
        state, m = step(state, images, labels)
    np.asarray(m["loss"])
    with trace_step(f"{'/tmp' if args.smoke else 'plots'}"
                    "/train_step_trace_r4") as t:
        for _ in range(3):
            state, m = step(state, images, labels)
        np.asarray(m["loss"])

    df = ProfilerParser(t.path).remove_idle().to_pandas()
    # drop the aggregate rows (whole-step spans + bare step indices) and
    # host-only lanes — this table accounts DEVICE time
    df = df[~df["name"].str.match(r"jit_train_step|\d+$")]
    if df["device_total_ms"].sum() == 0 and args.smoke:
        # CPU traces have no device lane; account host op time instead so
        # the smoke still exercises the full join/bucket/roofline path
        df = df[df["name"].isin(entry)].copy()
        df["device_total_ms"] = df["host_total_ms"]
    df = df[df["device_total_ms"] > 0].copy()
    # conditional instructions report INCLUSIVE time — the executed branch
    # body (here: the mix route guard's Pallas `branch_1_fun` custom-calls)
    # is tracked as its own row, so keeping the parents double-counts the
    # whole `lax.cond` subtree (8 x ~1.7 ms = 13.6 ms at flagship shape:
    # exactly the round-4 gap between the 143.2 ms tracked sum and
    # bench.py's 129.7 ms). Drop the parents only when at least one branch
    # body row is independently tracked.
    cond_names = {n for n, (_, opc, _, _) in entry.items()
                  if opc == "conditional"}
    if df["name"].str.match(r"branch_\d+_fun").any():
        dropped = df["name"].isin(cond_names) | df["name"].str.match(
            r"conditional(\.\d+)?$")
        if dropped.any():
            print(f"dropping {int(dropped.sum())} conditional parent rows "
                  f"({df.loc[dropped, 'device_total_ms'].sum() / 3:.1f} "
                  f"ms/step inclusive — already tracked in their branch "
                  f"bodies)", flush=True)
            df = df[~dropped]
    step_ms = df["device_total_ms"].sum() / 3

    rows = []
    for _, r in df.iterrows():
        name = r["name"]
        type_str, opcode, op_name, calls = entry.get(
            name, ("", name.split(".")[0], "", None))
        inner = comp_opnames.get(calls, []) if calls else []
        all_names = ([op_name] if op_name else []) + inner
        bucket = classify_row(name, all_names, opcode)
        # roofline: bytes = output + operand footprints are not separable
        # from the text reliably for operands (they are references), so use
        # the output bytes as the WRITE floor; reads >= writes for every
        # fusion here except reductions, making this a conservative floor
        out_bytes = shape_bytes(type_str)
        ms = r["device_total_ms"] / 3
        rows.append({
            "name": name, "bucket": bucket, "ms_per_step": round(ms, 4),
            "calls": r["calls"], "opcode": opcode,
            "out_bytes": out_bytes,
            "attribution": ";".join(dict.fromkeys(
                n.split("jit(train_step)/")[-1] for n in all_names))[:400],
        })

    rows.sort(key=lambda x: -x["ms_per_step"])
    import csv
    import io
    buf = io.StringIO()
    w = csv.DictWriter(buf, fieldnames=list(rows[0]))
    w.writeheader()
    w.writerows(rows)
    with gzip.open(out_full, "wt") as f:
        f.write(f"# FULL per-op table, flagship train step B=1024 "
                f"mix_block=64, v5e; ms_per_step over a 3-step window; "
                f"total tracked {step_ms:.1f} ms/step\n")
        f.write(buf.getvalue())
    print(f"wrote {out_full} ({len(rows)} rows, {step_ms:.1f} ms/step "
          f"tracked)", flush=True)

    # bucket summary
    buckets = defaultdict(lambda: [0.0, 0])
    for r in rows:
        buckets[r["bucket"]][0] += r["ms_per_step"]
        buckets[r["bucket"]][1] += 1
    with open(out_buckets, "w") as f:
        f.write("bucket,ms_per_step,pct_of_step,n_ops\n")
        for b, (ms, n) in sorted(buckets.items(), key=lambda kv: -kv[1][0]):
            f.write(f"{b},{ms:.2f},{100 * ms / step_ms:.1f},{n}\n")
            print(f"{b:36s} {ms:8.2f} ms  {100 * ms / step_ms:5.1f}%  "
                  f"({n} ops)")
    print(f"wrote {out_buckets}")

    # roofline floor: per-op max(flops/peak, write-bytes/bw); FLOPs from
    # cost_analysis are whole-program, so apply them to the GEMM bucket
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    gemm_floor_ms = flops / PEAK_FLOPS * 1e3
    nongemm_write_bytes = sum(r["out_bytes"] for r in rows
                              if r["bucket"] != "GEMM (dot_general)")
    gemm_ms = buckets["GEMM (dot_general)"][0]
    write_floor_ms = nongemm_write_bytes / HBM_BW * 1e3
    print(f"\nroofline: GEMM floor {gemm_floor_ms:.1f} ms "
          f"({flops / 1e12:.2f} TFLOP @ {PEAK_FLOPS / 1e12:.0f} TF/s peak); "
          f"measured GEMM bucket {gemm_ms:.1f} ms "
          f"({100 * gemm_floor_ms / max(gemm_ms, 1e-9):.0f}% of peak)")
    print(f"non-GEMM write-traffic floor {write_floor_ms:.1f} ms "
          f"({nongemm_write_bytes / 2**30:.2f} GiB @ 819 GB/s) — reads not "
          f"counted (conservative)")
    print(f"step floor ~{gemm_floor_ms + write_floor_ms:.1f} ms vs "
          f"measured {step_ms:.1f} ms")


if __name__ == "__main__":
    main()
