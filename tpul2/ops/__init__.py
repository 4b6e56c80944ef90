from tpul2.ops.matmul import pallas_matmul, pallas_matmul_fused  # noqa: F401
from tpul2.ops.batched import pallas_batched_matmul  # noqa: F401
from tpul2.ops.baselines import BASELINES, baseline_fn  # noqa: F401
