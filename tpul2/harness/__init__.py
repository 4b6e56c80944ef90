from tpul2.harness.correctness import run_correctness_check  # noqa: F401
from tpul2.harness.bench_offline import benchmark_offline  # noqa: F401
from tpul2.harness.bench_server import benchmark_server  # noqa: F401
from tpul2.harness.summarize import summarize_results  # noqa: F401
from tpul2.harness.defense import run_all_defenses  # noqa: F401
