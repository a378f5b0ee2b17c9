"""Collective-schedule audit of compiled SPMD programs (VERDICT r4 #5).

Loss parity across parallelism legs cannot distinguish a correctly sharded
program from one GSPMD silently replicated — a replicated "FSDP" run
produces the identical loss at 8x the memory and traffic. These helpers
read the compiled HLO and count the collectives by opcode so the dryrun
(and tests) can assert each leg's EXPECTED communication signature:

- pure DP: >=1 all-reduce (the gradient psum), zero all-gathers and zero
  reduce-scatters (params are replicated — nothing to gather);
- FSDP/ZeRO-3: >=1 all-gather (per-weight gather before use) AND >=1
  reduce-scatter (gradient shard reduction). Small leaves below the
  ``min_size`` threshold stay replicated by design, so their gradient
  all-reduce legitimately remains;
- TP: strictly MORE all-reduces than the pure-DP program over the same
  model — the activation reductions on the model axis come on top of the
  gradient psum and cannot be merged into it.

The reference has no distributed machinery at all (SURVEY.md §2.3); this
audit is part of the TPU-native parallelism layer's own test surface.
"""

from __future__ import annotations

import re

# -start/-done pairs count once: "-done(" cannot match the optional
# "-start"/bare alternatives, so done lines never count. The opcode is
# anchored between whitespace and "(%"/"()" — operands in optimized HLO
# are always %refs, so the pattern cannot fire inside a type string (which
# may contain "=" via "/*index=N*/" comments in variadic tuple types — a
# [^=]* guard would silently skip variadic all-reduces over grad trees).
_COLLECTIVE_RE = re.compile(
    r"\s(all-reduce|all-gather|reduce-scatter|all-to-all|collective-permute)"
    r"(?:-start)?\((?:%|\))")


_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def collective_counts(hlo_text: str) -> dict[str, int]:
    """Count collective ops in optimized HLO text, keyed by base opcode.

    Async ``-start``/``-done`` pairs count once. Only instruction lines are
    scanned (indented, with an ``=``), so computation signatures and
    metadata cannot false-positive.
    """
    counts: dict[str, int] = {}
    for _, op in collective_ops(hlo_text):
        counts[op] = counts.get(op, 0) + 1
    return counts


def collective_ops(hlo_text: str) -> list[tuple[str, str]]:
    """(op_name scope, base opcode) for every collective instruction —
    the scope is the jax metadata path, empty when absent. Lets signature
    asserts distinguish param/grad movement from known data-pipeline
    collectives (e.g. the augmentation's pixel-source gather)."""
    out = []
    for line in hlo_text.splitlines():
        if not line.startswith(" ") or " = " not in line:
            continue
        m = _COLLECTIVE_RE.search(line)
        if m:
            scope = _OPNAME_RE.search(line)
            out.append((scope.group(1) if scope else "", m.group(1)))
    return out


def audit_compiled(lowered_or_compiled) -> dict[str, int]:
    """Collective counts of a ``jit(...).lower(...)`` (compiled here) or an
    already-compiled executable. The returned dict carries an extra
    ``"_augment_gathers"`` key: all-gathers attributed to the augmentation
    pipeline (jit(augment) scope) — the rotation resample's flat-index
    formulation makes GSPMD gather the [C, B*H*W] pixel source on DP
    meshes (12.6 MB at B=1024; the batch-local take_along formulation
    that avoids it measured 8x slower on-chip,
    benchmarks/rotate_variants.py), so it is counted separately and
    allowed by the DP signature; param/grad gathers stay hard errors."""
    obj = lowered_or_compiled
    if hasattr(obj, "compile"):
        obj = obj.compile()
    ops = collective_ops(obj.as_text())
    counts: dict[str, int] = {}
    aug = 0
    for scope, op in ops:
        if op == "all-gather" and "augment" in scope:
            aug += 1
            continue
        counts[op] = counts.get(op, 0) + 1
    if aug:
        counts["_augment_gathers"] = aug
    return counts


def assert_dp_signature(counts: dict[str, int], leg: str = "dp") -> None:
    """Pure data parallelism: gradient psum present, no param movement.
    Augment-scoped pixel gathers (``_augment_gathers``) are allowed — see
    audit_compiled."""
    assert counts.get("all-reduce", 0) >= 1, \
        f"{leg}: expected a gradient all-reduce, got {counts}"
    assert counts.get("all-gather", 0) == 0, \
        f"{leg}: unexpected non-augment all-gather (params should be " \
        f"replicated): {counts}"
    assert counts.get("reduce-scatter", 0) == 0, \
        f"{leg}: unexpected reduce-scatter in a replicated-param program: " \
        f"{counts}"


def assert_fsdp_signature(counts: dict[str, int]) -> None:
    """ZeRO-3: per-weight all-gathers + sharded gradient reduction present.

    The gradient shard reduction appears as ``reduce-scatter`` on TPU, but
    XLA's SPMD partitioner may decompose it into ``all-to-all`` + local
    reduce (observed on the CPU backend: 25 all-to-alls, zero literal
    reduce-scatters for the same program) — either form proves gradients
    are NOT fully replicated."""
    assert counts.get("all-gather", 0) >= 1, \
        f"fsdp: expected per-weight all-gathers, got {counts} — " \
        "the program is NOT parameter-sharded"
    assert counts.get("reduce-scatter", 0) + counts.get("all-to-all", 0) \
        >= 1, \
        f"fsdp: expected gradient reduce-scatters (or their all-to-all " \
        f"decomposition), got {counts} — gradients are being fully " \
        "replicated"


def assert_tp_signature(counts: dict[str, int],
                        dp_counts: dict[str, int]) -> None:
    """DPxTP: activation all-reduces on the model axis come ON TOP of the
    gradient psum — strictly more all-reduces than the pure-DP program."""
    assert counts.get("all-reduce", 0) > dp_counts.get("all-reduce", 0), \
        f"tp: expected MORE all-reduces than pure DP " \
        f"(activation reductions on the model axis), got tp={counts} " \
        f"dp={dp_counts} — the model axis is not being used"
