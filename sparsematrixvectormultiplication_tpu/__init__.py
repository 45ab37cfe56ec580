"""sparsematrixvectormultiplication_tpu — TPU-native SpMV framework.

A ground-up JAX/Pallas re-design of the capabilities of the C/OpenMP/CUDA
reference ``MarcoLor01/SparseMatrixVectorMultiplication``: MatrixMarket IO,
CSR / HLL (hacked-ELLPACK) / SELL-C-128 layouts, XLA oracle kernels plus
Pallas TPU kernels, nnz-balanced scheduling, multi-chip sharding, and a
validating GFLOPS/bandwidth benchmark harness. See SURVEY.md for the layer
map and docs/DESIGN.md for the TPU kernel design rationale.
"""

from .formats.coo import COOMatrix
from .formats.csr import CSRMatrix
from .formats.hll import DEFAULT_HACK_SIZE, HLLMatrix
from .formats.sell import SellMatrix
from .formats.split import SplitMatrix
from .ops.auto import auto_device_op, choose_format
from .io.mmio import (
    MMIOError,
    MMTypeCode,
    read_banner,
    read_matrix_market,
    write_matrix_market,
)

__version__ = "0.1.0"

__all__ = [
    "COOMatrix",
    "CSRMatrix",
    "HLLMatrix",
    "SellMatrix",
    "SplitMatrix",
    "auto_device_op",
    "choose_format",
    "DEFAULT_HACK_SIZE",
    "MMIOError",
    "MMTypeCode",
    "read_banner",
    "read_matrix_market",
    "write_matrix_market",
    "__version__",
]
