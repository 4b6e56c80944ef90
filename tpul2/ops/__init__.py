from tpul2.ops.matmul import pallas_matmul  # noqa: F401
from tpul2.ops.baselines import BASELINES, baseline_fn  # noqa: F401
