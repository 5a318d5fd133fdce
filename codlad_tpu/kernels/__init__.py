from codlad_tpu.kernels.mpnn_kernels import (  # noqa: F401
    fused_message_edge,
    fused_message_sum,
)
