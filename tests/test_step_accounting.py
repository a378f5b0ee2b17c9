"""Pin the step-accounting harness's HLO-join/classify logic (VERDICT r3 #2).

The full harness (benchmarks/step_accounting.py) runs unattended on the TPU
queue; these tests pin the pieces a bad trace would otherwise only expose
there: scope-path cleaning (jax transform wrappers must not leak into bucket
matching), the bucket rules, and the HLO text parser.
"""

import gzip
import os
import subprocess
import sys

import pytest

from benchmarks.step_accounting import (  # noqa: E402
    classify,
    classify_row,
    clean_paths,
    parse_hlo,
    shape_bytes,
)


def test_clean_paths_strips_transform_wrappers_keeps_wrapped_names():
    paths, prims = clean_paths([
        "jit(train_step)/transpose(jvp(SpectreViT))/encoder_blocks/layer_0/"
        "mix_layer/linear/dot_general",
        "jit(train_step)/vmap(jit(rotate))/gather",
    ])
    # the backward transform prefix must NOT contribute the token
    # "transpose" (it would swallow the whole backward into the relayout
    # bucket) but the wrapped function name "rotate" must survive
    assert "transpose(" not in paths[0]
    assert paths[0].startswith("SpectreViT/encoder_blocks")
    assert prims[0] == "dot_general"
    assert "rotate" in paths[1]
    assert prims[1] == "gather"


def test_backward_fusion_buckets_by_module_not_transform():
    # a backward mix fusion: transform prefix says "transpose", module path
    # says mix_layer — it must land in the mix bucket
    b = classify(
        ["jit(train_step)/transpose(jvp(SpectreViT))/encoder_blocks/"
         "layer_1/mix_layer/linear/convert_element_type"],
        "fusion")
    assert b.startswith("mix fold/sign/route")


def test_dot_fusion_wins_over_epilogue_opnames():
    b = classify(
        ["jit(train_step)/jvp(SpectreViT)/encoder_blocks/layer_0/mix_layer/"
         "linear/dot_general",
         "jit(train_step)/jvp(SpectreViT)/encoder_blocks/layer_0/mix_layer/"
         "linear/add"],
        "fusion")
    assert b == "GEMM (dot_general)"


def test_augment_ops_bucket_via_wrapped_function_name():
    assert classify(["jit(train_step)/vmap(jit(rotate))/gather"],
                    "fusion") == "augmentation"


def test_pure_relayout_primitives_bucket_as_relayout():
    assert classify(
        ["jit(train_step)/jvp(SpectreViT)/transpose"], "fusion"
    ) == "transpose/copy/relayout"
    assert classify([], "copy-start") == "transpose/copy/relayout"


def test_no_metadata_fusion_falls_back_to_name():
    assert classify_row("wrapped_convert.1", [], "fusion") == \
        "transpose/copy/relayout"
    assert classify_row("loop_add_fusion.3", [], "fusion") == \
        "other (fusion)"


def test_optimizer_and_loss_rules():
    assert classify(
        ["jit(train_step)/adamw/scale_by_adam/mul"], "fusion"
    ) == "optimizer (AdamW+cosine)"
    assert classify(
        ["jit(train_step)/softmax_cross_entropy/log_softmax/reduce"],
        "fusion") == "loss (CE+softmax)"


def test_parse_hlo_extracts_types_opcodes_metadata_and_called_comps():
    hlo = """\
HloModule jit_train_step

%fused_computation.1 (p0: f32[8,16]) -> f32[8,16] {
  %p0 = f32[8,16] parameter(0)
  ROOT %m = f32[8,16] multiply(%p0, %p0), metadata={op_name="jit(train_step)/jvp(SpectreViT)/encoder_blocks/layer_0/mix_layer/linear/mul" source_file="x.py"}
}

ENTRY %main (a: f32[8,16]) -> f32[8,16] {
  %a = f32[8,16] parameter(0)
  %fusion.1 = f32[8,16] fusion(%a), kind=kLoop, calls=%fused_computation.1, metadata={op_name="jit(train_step)/jvp(SpectreViT)/encoder_blocks/layer_0/mix_layer/linear/mul"}
  ROOT %t = (f32[8,16], s32[2]) tuple(%fusion.1, %fusion.1)
}
"""
    entry, comp_opnames, comp_flops, instr_flops, cond_branches, \
        instr_comp = parse_hlo(hlo)
    assert "fusion.1" in entry
    type_str, opcode, op_name, calls = entry["fusion.1"]
    assert opcode == "fusion"
    assert "mix_layer/linear/mul" in op_name
    assert calls == "fused_computation.1"
    assert any("mix_layer" in n for n in comp_opnames["fused_computation.1"])
    assert shape_bytes(type_str) == 8 * 16 * 4
    # tuple type sums its elements
    assert shape_bytes("(f32[8,16], s32[2])") == 8 * 16 * 4 + 2 * 4
    assert instr_comp["fusion.1"] == "main"
    assert instr_comp["m"] == "fused_computation.1"


def test_parse_hlo_dot_flops_and_cond_branches():
    hlo = """\
HloModule jit_train_step

%fused_dot.1 (p0: bf16[64,128], p1: bf16[128,32]) -> bf16[64,32] {
  %p0 = bf16[64,128] parameter(0)
  %p1 = bf16[128,32] parameter(1)
  ROOT %d = bf16[64,32] dot(%p0, %p1), lhs_contracting_dims={1}, rhs_contracting_dims={0}
}

%branch_0_fun.7 (q: bf16[4]) -> bf16[4] {
  %q = bf16[4] parameter(0)
  ROOT %neg = bf16[4] negate(%q)
}

%branch_1_fun.8 (q2: bf16[4]) -> bf16[4] {
  %q2 = bf16[4] parameter(0)
  ROOT %cc = bf16[4] custom-call(%q2), custom_call_target="tpu_custom_call"
}

ENTRY %main (a: bf16[64,128], b: bf16[128,32], p: pred[], t: bf16[4]) -> bf16[64,32] {
  %a = bf16[64,128] parameter(0)
  %b = bf16[128,32] parameter(1)
  %p = pred[] parameter(2)
  %t = bf16[4] parameter(3)
  %cond.1 = bf16[4] conditional(%p, %t, %t), branch_computations={%branch_0_fun.7, %branch_1_fun.8}
  ROOT %fusion.2 = bf16[64,32] fusion(%a, %b), kind=kOutput, calls=%fused_dot.1
}
"""
    entry, _, comp_flops, instr_flops, cond_branches, instr_comp = \
        parse_hlo(hlo)
    # 2*M*N*K = 2*64*32*128
    assert comp_flops["fused_dot.1"] == 2 * 64 * 32 * 128
    assert instr_flops["d"] == 2 * 64 * 32 * 128
    assert cond_branches["cond.1"] == ["branch_0_fun.7", "branch_1_fun.8"]
    # an instruction inside a branch computation maps back to it
    assert instr_comp["cc"] == "branch_1_fun.8"


def test_parse_hlo_conv_flops_exact_for_padded_and_dilated_lowerings():
    """On TPU, XLA canonicalizes every dot to a convolution; the two
    batched-matmul lowerings seen in the flagship step must count exactly:
    (a) window size=65 pad=64_64 over a size-1 lhs spatial dim (the mix
    backward: each output position overlaps exactly one real input tap),
    (b) size=65 stride=64 lhs_dilate=65 (the per-token forward projection).
    Both equal the einsum's true 2*65*8192*1024*512."""
    hlo = """\
HloModule jit_train_step

ENTRY %main (a: bf16[8192,512,1], w: bf16[65,1024,512], l2: bf16[65,8192,1024], w2: bf16[65,8192,512]) -> bf16[8192,65,1024] {
  %a = bf16[8192,512,1] parameter(0)
  %w = bf16[65,1024,512] parameter(1)
  %l2 = bf16[65,8192,1024] parameter(2)
  %w2 = bf16[65,8192,512] parameter(3)
  %cv = bf16[8192,65,1024] convolution(%a, %w), window={size=65 pad=64_64 rhs_reversal=1}, dim_labels=bf0_0oi->b0f
  ROOT %cd = bf16[65,1024,512] convolution(%l2, %w2), window={size=65 stride=64 lhs_dilate=65}, dim_labels=0fb_0io->0bf
}
"""
    _, _, _, instr_flops, _, _ = parse_hlo(hlo)
    want = 2 * 65 * 8192 * 1024 * 512
    assert instr_flops["cv"] == want
    assert instr_flops["cd"] == want


@pytest.mark.slow
def test_smoke_cpu_end_to_end(tmp_path):
    """Full harness on CPU at tiny batch: exercises trace -> HLO join ->
    buckets -> roofline without a chip. Slow (~3 min on 1 core)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the subprocess must see the repo root on sys.path regardless of the
    # parent's PYTHONPATH (the driver exports PYTHONPATH=. but a bare
    # `pytest tests/` run does not)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, "benchmarks/step_accounting.py", "--batch", "8",
         "--smoke"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "block routes registered" in r.stdout
    assert "roofline" in r.stdout
    with gzip.open("/tmp/v5e_train_step_ops_r5_full.csv.gz", "rt") as f:
        lines = f.read().splitlines()
    assert lines[0].startswith("#")
    assert lines[1].split(",")[:3] == ["name", "bucket", "ms_per_step"]
    assert len(lines) > 100
