"""Measure fused_content_tower True vs False at b4@256 bf16 on TPU
(docs/PERF.md round-3 entry). Reuses bench.bench_train_step so the
measurement recipe (device-resident batch, value-fetch hard sync) stays
defined in exactly one place."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import bench_train_step  # noqa: E402
from faststyle_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

for fused in (False, True):
    for rep in range(2):
        runs, _flops = bench_train_step(
            100, "bfloat16", fused_content_tower=fused, repeats=1
        )
        rate = runs[0]
        print(
            f"fused={fused} rep{rep}: {1e3 / rate:.2f} ms/step  ({rate:.1f} steps/s)",
            flush=True,
        )
print("=== MEASURE DONE ===")
