"""tpul2 — a TPU-native, per-shape autotuned matmul library.

TPU-first rebuild of the capabilities of deepreinforce-ai/CUDA-L2
(reference: /root/reference — a per-(M,N,K) autotuned CUDA HGEMM kernel zoo
plus benchmarking/validation harness).  Instead of 3,736 frozen ``.cu`` files
(one per shape), tpul2 ships ONE parameterized Pallas MXU kernel generator
(`tpul2.ops.matmul`) whose tile/grid/pipeline parameters are searched per
shape by `tpul2.autotune` and persisted in a tuning database, then dispatched
at call time by `tpul2.dispatch`.

Layer map (mirrors reference SURVEY.md §1, re-designed TPU-first):

  L5 driver      scripts/eval_one_shape.py       (ref: eval_one_file.sh)
  L4 harness     tpul2.harness.*                 (ref: *_check.py, benchmarking_*.py,
                                                   summarize_result.py, defense.py)
  L3 dispatch    tpul2.dispatch + tpul2.autotune (ref: tools/utils.py JIT build)
  L2 binding     tpul2.native (C++ tuning cache) (ref: pybind/*.cc)
  L1 kernels     tpul2.ops.matmul (Pallas/MXU)   (ref: kernels/*/M_N_K.cu)
  L0 vendor      XLA dot_general baselines       (ref: cuBLAS/cuBLASLt)
"""

__version__ = "0.1.0"

from tpul2.config import KernelConfig  # noqa: F401
from tpul2.dispatch import matmul, batched_matmul  # noqa: F401
