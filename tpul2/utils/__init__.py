from tpul2.utils.padding import (  # noqa: F401
    cdiv,
    round_up,
    pad_to,
    pad_operands,
    min_sublane,
    LANE,
)
from tpul2.utils.platform import (  # noqa: F401
    backend,
    on_tpu,
    default_interpret,
    tpu_peak_flops,
)
