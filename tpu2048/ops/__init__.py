"""TPU kernel layer: MXU one-hot table ops and Pallas fused kernels.

This package is the framework's "native layer" (SURVEY §2: the
reference is 100% Python, so the TPU-kernel layer replaces the
reference's CPU hot loops rather than porting native code): the
n-tuple weight-table gathers and scatter-adds that dominate the TD(0)
train step are re-expressed as two-level one-hot matmuls that run on
the MXU instead of latency-bound HBM random access.
"""

from .onehot import (
    CLASS_DECOMP,
    TableClasses,
    build_table_classes,
    onehot_eval,
    onehot_update,
)

__all__ = [
    "CLASS_DECOMP",
    "TableClasses",
    "build_table_classes",
    "onehot_eval",
    "onehot_update",
]
