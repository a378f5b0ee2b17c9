from spectre_tpu.parallel.audit import (
    assert_dp_signature,
    assert_fsdp_signature,
    assert_tp_signature,
    audit_compiled,
    collective_counts,
    collective_ops,
)
from spectre_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
)
from spectre_tpu.parallel.fsdp import (
    apply_fsdp,
    fsdp_shardings,
    pin_step_shardings,
)
from spectre_tpu.parallel.tp import (
    SPECTRE_TP_RULES,
    VIT_TP_RULES,
    apply_tp,
    tp_shardings,
)

__all__ = [
    "create_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
    "VIT_TP_RULES", "SPECTRE_TP_RULES", "apply_tp", "tp_shardings",
    "apply_fsdp", "fsdp_shardings", "pin_step_shardings",
    "collective_counts", "collective_ops", "audit_compiled",
    "assert_dp_signature",
    "assert_fsdp_signature", "assert_tp_signature",
]
