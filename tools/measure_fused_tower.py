"""Measure fused_content_tower True vs False at b4@256 bf16 on TPU (docs/PERF.md round-3 entry)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from faststyle_tpu.models import vgg16
from faststyle_tpu.training import slow_style
from faststyle_tpu.training.train_step import (
    TrainConfig,
    init_state,
    make_jitted_train_step,
)
from faststyle_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

config = TrainConfig.make(compute_dtype=jnp.bfloat16)
vgg_params = vgg16.init_params(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
style = rng.uniform(0, 255, (1, 256, 256, 3)).astype(np.float32)
grams = slow_style.style_target_grams(vgg_params, style, tuple(dict(config.style_weights)))
batch = jax.device_put(rng.uniform(0, 255, (4, 256, 256, 3)).astype(np.float32))

for fused in (False, True):
    step_fn = make_jitted_train_step(vgg_params, grams, config, fused_content_tower=fused)
    state = init_state(jax.random.PRNGKey(1), config)
    state, m = step_fn(state, batch)
    l0 = float(m["loss"])
    # two timed reps of 100 steps
    for rep in range(2):
        t0 = time.perf_counter()
        for _ in range(100):
            state, m = step_fn(state, batch)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / 100 * 1e3
        print(f"fused={fused} rep{rep}: {dt:.2f} ms/step  ({1000/dt:.1f} steps/s)  loss0={l0:.4g}", flush=True)
print("=== MEASURE DONE ===")
