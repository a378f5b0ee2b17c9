"""FULL per-op accounting of the flagship train step (VERDICT r3 #2).

Round 3 committed only 40-row CSV heads, leaving ~43 ms/step of the
130.5 ms step invisible and the three biggest non-GEMM fusion families
unattributed. This harness closes both gaps for bench.py's EXACT program
(flagship config, B=1024, block mix routes, device-side augmentation):

1. writes the COMPLETE per-op table (every tracked instruction, no head)
   to ``benchmarks/v5e_train_step_ops_{tag}_full.csv.gz``;
2. attributes every fusion to model ops by joining the trace against the
   compiled HLO's own metadata: each fused instruction carries
   ``metadata={op_name="jit(train_step)/<jax scope path>"}`` where the
   scope path includes the flax module names (``encoder/layers_2/mix``,
   ``patch_embed``, optimizer update, augmentation, ...) — ground truth,
   not guesswork;
3. buckets the step into named categories (GEMMs, mix gathers, layernorm,
   GELU, augmentation, optimizer, loss, ...) covering >=95% of device
   time, written to ``benchmarks/v5e_train_step_buckets_{tag}.csv``;
4. computes a per-instruction ROOFLINE floor: each op is bounded below by
   max(dot-FLOPs/peak, write-bytes/HBM-bw) — dot FLOPs parsed from the
   fused computations' own ``dot`` instructions (2·M·N·K from the printed
   operand/output shapes), write bytes from the op's output type. The
   per-op floors are a ``floor_ms`` column (with ``x_floor`` = measured /
   floor, the ranking key for "who is furthest off its own roofline"),
   and their sum is the speed-of-light for this op mix under this
   schedule, printed next to the measured step time.

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
# parameters take a literal index operand ("parameter(0)") so _INSTR_RE's
# %-operand guard skips them; their types are still needed for the dot-FLOP
# lhs lookup. The literal word "parameter(" cannot occur inside a type, so
# the lazy type match is safe here.
_PARAM_RE = re.compile(
    r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+(.*?)\s+parameter\(\d+\)")
_META_RE = re.compile(r'metadata=\{[^}]*op_name="([^"]*)"')
_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")
_BRANCHES_RE = re.compile(r"branch_computations=\{([^}]*)\}")
_CDIMS_RE = re.compile(r"lhs_contracting_dims=\{([\d,]*)\}")


def _dims(type_str: str) -> list[int]:
    """Dims of the FIRST array shape in an HLO type string."""
    m = _SHAPE_RE.search(type_str)
    if not m:
        return []
    return [int(d) for d in m.group(2).split(",") if d]


def _dot_flops(line: str, out_type: str, local_types: dict) -> float:
    """2·(out elems)·K for a printed ``dot`` instruction: K is the product
    of the lhs contracting dims, read from the lhs operand's type earlier
    in the same computation (post-layout HLO prints every instruction's
    type, so the local name→type map always has it)."""
    cd = _CDIMS_RE.search(line)
    m = re.search(r"\bdot\(([^)]*)\)", line)
    if not (cd and m):
        return 0.0
    lhs_name = m.group(1).split(",")[0].strip().lstrip("%")
    lhs_dims = _dims(local_types.get(lhs_name, ""))
    if not lhs_dims:
        return 0.0
    k = 1
    for i in (int(x) for x in cd.group(1).split(",") if x):
        if i < len(lhs_dims):
            k *= lhs_dims[i]
    out_elems = 1
    for d in _dims(out_type):
        out_elems *= d
    return 2.0 * out_elems * k


_WINDOW_RE = re.compile(r"window=\{([^}]*)\}")
_DIMLABELS_RE = re.compile(r"dim_labels=([\w]+)_([\w]+)->([\w]+)")


def _conv_flops(line: str, out_type: str, local_types: dict) -> float:
    """True FLOPs of a printed ``convolution`` — on TPU, XLA canonicalizes
    every dot to a convolution (batched matmuls become padded-window convs
    with ``rhs_reversal``), so this is where ALL the GEMM FLOPs live in the
    optimized text. The naive out_elems*K*i formula overcounts padded
    windows (the mix-backward lowering uses window size 65 with pad 64_64
    over a size-1 lhs spatial dim — 65x overcount); the exact count sums
    the window∩input overlap per output position, which factorizes across
    spatial dims. Grouped convs are correct as-is (rhs ``i`` is already
    per-group); dilations fall back to the per-window upper bound."""
    m = re.search(r"\bconvolution\(([^)]*)\)", line)
    dl = _DIMLABELS_RE.search(line)
    if not (m and dl):
        return 0.0
    ops = [o.strip().lstrip("%") for o in m.group(1).split(",")]
    if len(ops) < 2:
        return 0.0
    lhs_dims = _dims(local_types.get(ops[0], ""))
    rhs_dims = _dims(local_types.get(ops[1], ""))
    lhs_l, rhs_l, out_l = dl.groups()
    if len(lhs_dims) != len(lhs_l) or len(rhs_dims) != len(rhs_l):
        return 0.0
    try:
        b = lhs_dims[lhs_l.index("b")]
        i = rhs_dims[rhs_l.index("i")]
        o = rhs_dims[rhs_l.index("o")]
    except ValueError:
        return 0.0
    lhs_sp = [lhs_dims[idx] for idx, c in enumerate(lhs_l) if c.isdigit()]
    out_dims = _dims(out_type)
    out_sp = ([out_dims[idx] for idx, c in enumerate(out_l) if c.isdigit()]
              if len(out_dims) == len(out_l) else [])
    sizes = [rhs_dims[idx] for idx, c in enumerate(rhs_l) if c.isdigit()]
    pads = [(0, 0)] * len(sizes)
    strides = [1] * len(sizes)
    ldil = [1] * len(sizes)
    rdil = [1] * len(sizes)
    win = _WINDOW_RE.search(line)
    if win:
        for field in win.group(1).split():
            k, _, v = field.partition("=")
            parts = v.split("x")
            if k == "size":
                sizes = [int(p) for p in parts]
            elif k == "pad":
                pads = [tuple(int(q) for q in p.split("_")) for p in parts]
            elif k == "stride":
                strides = [int(p) for p in parts]
            elif k == "lhs_dilate":
                ldil = [int(p) for p in parts]
            elif k == "rhs_dilate":
                rdil = [int(p) for p in parts]
    taps = 1.0
    for d, K in enumerate(sizes):
        S = lhs_sp[d] if d < len(lhs_sp) else 1
        n_out = out_sp[d] if d < len(out_sp) else S
        p0 = pads[d][0] if d < len(pads) else 0
        st = strides[d] if d < len(strides) else 1
        ld = ldil[d] if d < len(ldil) else 1
        rd = rdil[d] if d < len(rdil) else 1
        if ld == 1 and rd == 1 and st == 1:
            tot = sum(max(0, min(S, n - p0 + K) - max(0, n - p0))
                      for n in range(n_out))
        else:
            # lhs-dilated/strided lowering (XLA uses these for batched
            # matmuls, e.g. the per-token folded projection: size=65
            # stride=64 lhs_dilate=65): a tap (n, k) only contributes when
            # n*st - p0 + k*rd lands on a dilated input position
            tot = 0
            for n in range(n_out):
                base = n * st - p0
                for k in range(K):
                    pos = base + k * rd
                    if pos >= 0 and pos % ld == 0 and pos // ld < S:
                        tot += 1
        taps *= tot
    return 2.0 * b * o * i * taps


def parse_hlo(hlo: str):
    """Parse optimized HLO text.

    Returns (entry: {instr_name: (type_str, opcode, op_name, calls)},
             comp_opnames: {computation_name: [op_name, ...]},
             comp_flops: {computation_name: dot FLOPs inside it},
             cond_branches: {conditional instr: [branch computation names]},
             instr_comp: {instr_name: computation it lives in}).
    """
    entry = {}
    comp_opnames = defaultdict(list)
    comp_flops = defaultdict(float)
    instr_flops = {}
    cond_branches = {}
    instr_comp = {}
    local_types: dict[str, str] = {}
    cur_comp = None
    for line in hlo.splitlines():
        if line and not line[0].isspace():
            m = re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)\s*(?:\()", line)
            cur_comp = m.group(1) if m else None
            local_types = {}
            continue
        m = _INSTR_RE.match(line)
        if not m or cur_comp is None:
            if cur_comp is not None:
                pm = _PARAM_RE.match(line)
                if pm:
                    local_types[pm.group(1)] = pm.group(2).strip()
            continue
        name, type_str, opcode = m.group(1), m.group(2).strip(), m.group(3)
        local_types[name] = type_str
        meta = _META_RE.search(line)
        op_name = meta.group(1) if meta else ""
        calls = _CALLS_RE.search(line)
        entry.setdefault(name, (type_str, opcode, op_name,
                                calls.group(1) if calls else None))
        instr_comp.setdefault(name, cur_comp)
        if opcode == "dot":
            fl = _dot_flops(line, type_str, local_types)
            comp_flops[cur_comp] += fl
            instr_flops[name] = fl
        elif opcode == "convolution":
            fl = _conv_flops(line, type_str, local_types)
            comp_flops[cur_comp] += fl
            instr_flops[name] = fl
        if opcode == "conditional":
            br = _BRANCHES_RE.search(line)
            if br:
                cond_branches[name] = [
                    b.strip().lstrip("%") for b in br.group(1).split(",")]
        if op_name:
            comp_opnames[cur_comp].append(op_name)
    return entry, comp_opnames, comp_flops, instr_flops, cond_branches, \
        instr_comp


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
    # SpectreLinear internals that are neither the GEMM nor the fused LN
    # scale: the backward dbias reduce_sums and the in-layer LN variance
    # reductions (flax names them linearN/jit(_var); clean_paths unwraps
    # the jit() wrapper to bare _var)
    ("FF bias-grad/LN reduce (SpectreLinear)",
     r"linear\d+/reduce_sum|linear\d+/_var|/_var$"),
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
    # (no post-vote re-scan of the joined string: no rule pattern can span
    # the per-path join separator, so a joined match implies a per-path
    # vote — ADVICE r4)
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
    ap.add_argument("--tag", default="r5",
                    help="artifact name tag (v5e_train_step_*_{tag}*)")
    args = ap.parse_args()
    prefix = "/tmp" if args.smoke else "benchmarks"
    out_full = f"{prefix}/v5e_train_step_ops_{args.tag}_full.csv.gz"
    out_buckets = f"{prefix}/v5e_train_step_buckets_{args.tag}.csv"

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
    # debugging aid: the raw text the join runs against — next to the other
    # artifacts (a fixed /tmp path clobbered concurrent runs, ADVICE r4)
    hlo_path = f"{prefix}/step_hlo_{args.tag}.txt"
    with open(hlo_path, "w") as f:
        f.write(hlo)
    print(f"HLO dump: {hlo_path}", flush=True)
    (entry, comp_opnames, comp_flops, instr_flops, cond_branches,
     instr_comp) = parse_hlo(hlo)
    print(f"parsed {len(entry)} instructions, "
          f"{len(comp_opnames)} computations with metadata, "
          f"{sum(comp_flops.values()) / 1e12:.2f} TFLOP in parsed "
          f"dots/convs",
          flush=True)

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
    # Per-conditional matching (ADVICE r4): a parent is dropped ONLY when a
    # tracked row lives inside one of ITS OWN branch computations (or is the
    # branch computation itself) — a conditional whose branch body was not
    # independently tracked keeps its inclusive row so its time still counts.
    tracked = set(df["name"])
    drop_names = set()
    for cond, branches in cond_branches.items():
        bset = set(branches)
        body_tracked = any(
            n in bset or instr_comp.get(n) in bset for n in tracked
            if n != cond)
        if body_tracked and cond in tracked:
            drop_names.add(cond)
    if drop_names:
        dropped = df["name"].isin(drop_names)
        print(f"dropping {int(dropped.sum())} conditional parent rows "
              f"({df.loc[dropped, 'device_total_ms'].sum() / 3:.1f} "
              f"ms/step inclusive — already tracked in their branch "
              f"bodies)", flush=True)
        df = df[~dropped]
    n_cond = sum(1 for _, (_, opc, _, _) in entry.items()
                 if opc == "conditional")
    if len(drop_names) != n_cond and n_cond:
        print(f"note: {n_cond - len(drop_names)} of {n_cond} conditionals "
              f"kept their inclusive parent rows (branch bodies not "
              f"independently tracked)", flush=True)
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
        # fusion here except reductions, making this a conservative floor.
        # FLOPs: the dots parsed inside this fusion's called computation
        # (custom-calls/Pallas have no parsed dots — bytes floor only).
        out_bytes = shape_bytes(type_str)
        flops = comp_flops.get(calls, 0.0) if calls else 0.0
        if opcode in ("dot", "convolution"):
            flops = instr_flops.get(name, 0.0)
        floor_ms = max(flops / PEAK_FLOPS, out_bytes / HBM_BW) * 1e3
        ms = r["device_total_ms"] / 3
        rows.append({
            "name": name, "bucket": bucket, "ms_per_step": round(ms, 4),
            "calls": r["calls"], "opcode": opcode,
            "out_bytes": out_bytes,
            "flops": int(flops),
            "floor_ms": round(floor_ms, 4),
            "x_floor": round(ms / floor_ms, 2) if floor_ms > 1e-6 else "",
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
    # the whole point of this harness is NAMED accounting: any unattributed
    # bucket above 2% of the step means the trace→HLO join regressed
    for b, (ms, _) in buckets.items():
        if b.startswith("other (") and ms > 0.02 * step_ms:
            print(f"WARNING: unattributed bucket '{b}' is "
                  f"{100 * ms / step_ms:.1f}% of the step (>2%) — the "
                  f"name join lost these ops", flush=True)

    # roofline floors, three views:
    # (a) whole-program GEMM FLOP floor from cost_analysis (ground truth
    #     for total FLOPs — includes any dots the text parse missed),
    # (b) non-GEMM write-traffic floor from the output shapes,
    # (c) the per-op floor sum (max(flop, write) per op) — the tightest
    #     composite this table supports.
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    gemm_floor_ms = flops / PEAK_FLOPS * 1e3
    nongemm_write_bytes = sum(r["out_bytes"] for r in rows
                              if r["bucket"] != "GEMM (dot_general)")
    gemm_ms = buckets["GEMM (dot_general)"][0]
    write_floor_ms = nongemm_write_bytes / HBM_BW * 1e3
    perop_floor_ms = sum(r["floor_ms"] for r in rows)
    print(f"\nroofline: GEMM floor {gemm_floor_ms:.1f} ms "
          f"({flops / 1e12:.2f} TFLOP @ {PEAK_FLOPS / 1e12:.0f} TF/s peak); "
          f"measured GEMM bucket {gemm_ms:.1f} ms "
          f"({100 * gemm_floor_ms / max(gemm_ms, 1e-9):.0f}% of peak)")
    print(f"non-GEMM write-traffic floor {write_floor_ms:.1f} ms "
          f"({nongemm_write_bytes / 2**30:.2f} GiB @ 819 GB/s) — reads not "
          f"counted (conservative)")
    print(f"bucket-level step floor ~{gemm_floor_ms + write_floor_ms:.1f} "
          f"ms; per-op floor sum {perop_floor_ms:.1f} ms; measured "
          f"{step_ms:.1f} ms "
          f"({100 * (gemm_floor_ms + write_floor_ms) / step_ms:.0f}% / "
          f"{100 * perop_floor_ms / step_ms:.0f}% of measured)")
    worst = sorted((r for r in rows if r["floor_ms"] > 0.1),
                   key=lambda r: -(r["ms_per_step"] - r["floor_ms"]))[:12]
    print("\nworst offenders by (measured - floor) ms/step:")
    for r in worst:
        print(f"  {r['name']:32s} {r['bucket']:28s} "
              f"{r['ms_per_step']:7.3f} ms  floor {r['floor_ms']:7.3f} "
              f"({r['x_floor']}x)")


if __name__ == "__main__":
    main()
