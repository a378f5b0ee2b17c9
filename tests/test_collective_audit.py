"""Collective-schedule audit (parallel/audit.py, VERDICT r4 #5).

Unit-level: the HLO counting is pinned on synthetic text. Integration:
tiny real programs compiled over the 8-device CPU mesh must show the
expected signatures — a DP grad step emits an all-reduce and no
all-gathers; an FSDP-sharded step emits all-gathers + reduce-scatters.
The full flagship-topology check runs inside ``dryrun_multichip``
(tests/test_graft_entry.py), which now hard-asserts every leg.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from spectre_tpu.parallel import (
    assert_dp_signature,
    assert_fsdp_signature,
    assert_tp_signature,
    audit_compiled,
    collective_counts,
    collective_ops,
    create_mesh,
)


def test_collective_counts_on_synthetic_hlo():
    hlo = """\
HloModule m

ENTRY %main (a: f32[8]) -> f32[8] {
  %a = f32[8] parameter(0)
  %ar = f32[8] all-reduce(%a), replica_groups={{0,1}}, to_apply=%add
  %ags = (f32[8], f32[16]) all-gather-start(%ar), dimensions={0}
  %agd = f32[16] all-gather-done(%ags)
  %rs = f32[4] reduce-scatter(%ar), dimensions={0}, to_apply=%add
  %var = (f32[8]{0}, f32[4,2]{1,0}, /*index=2*/f32[8]{0}) all-reduce(%a, %a, %a), to_apply=%add
  ROOT %out = f32[8] add(%ar, %ar)
}
"""
    # the variadic grad-tree all-reduce's tuple type carries "/*index=N*/"
    # comments (an "=" inside the type) — it must still count
    c = collective_counts(hlo)
    assert c == {"all-reduce": 2, "all-gather": 1, "reduce-scatter": 1}


def test_collective_ops_carries_opname_scope():
    hlo = """\
HloModule m

ENTRY %main (a: f32[8]) -> f32[8] {
  %a = f32[8] parameter(0)
  %ag = f32[16] all-gather(%a), dimensions={0}, metadata={op_name="jit(train_step)/jit(augment)/vmap(jit(_take))/gather"}
  ROOT %ar = f32[8] all-reduce(%a), to_apply=%add, metadata={op_name="jit(train_step)/transpose(jvp(M))/dot_general"}
}
"""
    ops = collective_ops(hlo)
    assert ("jit(train_step)/jit(augment)/vmap(jit(_take))/gather",
            "all-gather") in ops
    # the augment-scoped gather is the DP-allowed pixel-source gather:
    # a synthetic audit over these ops must separate it out
    scopes = dict(ops)
    assert scopes["jit(train_step)/transpose(jvp(M))/dot_general"] == \
        "all-reduce"


def test_signature_asserts():
    assert_dp_signature({"all-reduce": 2})
    with pytest.raises(AssertionError):
        assert_dp_signature({})
    with pytest.raises(AssertionError):
        assert_dp_signature({"all-reduce": 1, "all-gather": 3})
    assert_fsdp_signature({"all-reduce": 1, "all-gather": 5,
                           "reduce-scatter": 5})
    with pytest.raises(AssertionError):
        assert_fsdp_signature({"all-reduce": 4})
    assert_tp_signature({"all-reduce": 3}, {"all-reduce": 1})
    with pytest.raises(AssertionError):
        assert_tp_signature({"all-reduce": 1}, {"all-reduce": 1})


def _grad_step(mesh, w_spec):
    """A minimal linear-regression grad step over the mesh: batch sharded
    on data, weights placed per ``w_spec``."""
    w = jax.device_put(np.ones((256, 4), np.float32),
                       NamedSharding(mesh, w_spec))
    x = jax.device_put(np.ones((16, 256), np.float32),
                       NamedSharding(mesh, P("data")))
    y = jax.device_put(np.zeros((16, 4), np.float32),
                       NamedSharding(mesh, P("data")))

    @jax.jit
    def step(w, x, y):
        def loss(w):
            return jnp.mean((x @ w - y) ** 2)
        g = jax.grad(loss)(w)
        return w - 0.1 * g

    return step.lower(w, x, y)


def test_real_dp_program_signature():
    mesh = create_mesh(jax.devices()[:8])
    counts = audit_compiled(_grad_step(mesh, P()))
    assert_dp_signature(counts)


def test_real_sharded_param_program_shows_gather_scatter():
    mesh = create_mesh(jax.devices()[:8])
    # weights sharded over the data axis = the ZeRO-3 layout: using them
    # forces an all-gather; GSPMD reduces their gradient with a
    # reduce-scatter (possibly fused as all-reduce+dynamic-slice — accept
    # either gather evidence, but require the param movement to exist)
    counts = audit_compiled(_grad_step(mesh, P("data")))
    assert counts.get("all-gather", 0) >= 1 or \
        counts.get("reduce-scatter", 0) >= 1, counts


def test_audit_compiled_separates_augment_gathers():
    """all-gathers inside the augmentation scope are counted under
    ``_augment_gathers`` (DP-allowed pixel-source gather) while any other
    all-gather stays a hard DP-signature error."""
    hlo = """\
HloModule m

ENTRY %main (a: f32[8]) -> f32[8] {
  %a = f32[8] parameter(0)
  %ag1 = f32[16] all-gather(%a), dimensions={0}, metadata={op_name="jit(train_step)/jit(augment)/vmap(jit(_take))/gather"}
  %ag2 = f32[16] all-gather(%a), dimensions={0}, metadata={op_name="jit(train_step)/jvp(SpectreViT)/mlp_head/dot_general"}
  ROOT %ar = f32[8] all-reduce(%a), to_apply=%add
}
"""

    class FakeCompiled:
        def as_text(self):
            return hlo

    counts = audit_compiled(FakeCompiled())
    assert counts == {"_augment_gathers": 1, "all-gather": 1,
                      "all-reduce": 1}
    with pytest.raises(AssertionError):
        assert_dp_signature(counts)  # the param-scoped gather still fails
    ok = dict(counts)
    ok.pop("all-gather")
    assert_dp_signature(ok)  # augment-scoped gather alone is allowed
