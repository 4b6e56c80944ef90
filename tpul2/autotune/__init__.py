from tpul2.autotune.db import TuneDB, default_db  # noqa: F401
from tpul2.autotune.search import tune_shape, tune_many  # noqa: F401
