from tpul2.native.build import (  # noqa: F401
    NativeTuneCache,
    native_available,
    native_heuristic,
)
