from tpul2.parallel.mesh import make_mesh  # noqa: F401
from tpul2.parallel.sharded_matmul import (  # noqa: F401
    dp_matmul,
    tp_matmul,
    kshard_matmul,
    kshard_scatter_matmul,
    sharded_matmul_2d,
)
