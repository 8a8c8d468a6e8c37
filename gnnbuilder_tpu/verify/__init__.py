"""Golden-parity verification: pure-torch PyG-semantics reference models
(torch_ref), torch->JAX weight porting (port), and the reference-format
binary golden-data serializer + MAE parity check (golden)."""

from gnnbuilder_tpu.verify.golden import (
    gen_testbench_data,
    load_golden_outputs,
    parity_check,
    serialize_params,
    serialize_tensor,
)

__all__ = [
    "gen_testbench_data",
    "load_golden_outputs",
    "parity_check",
    "serialize_params",
    "serialize_tensor",
]
