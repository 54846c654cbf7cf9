from calm_tpu.ops.qmm import QTensor, qmatmul, dequant  # noqa: F401
from calm_tpu.ops.norms import rmsnorm  # noqa: F401
from calm_tpu.ops.rope import rope_interleaved  # noqa: F401
