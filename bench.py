#!/usr/bin/env python3
"""Benchmark harness. Prints ONE JSON line with the headline metric:
1080p stylization frames/sec on a single chip (BASELINE.md target: >= 60).

Extra measurements (512px fps, train step/sec) are included under "details".
Run with --quick for a reduced frame count.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

TARGET_FPS_1080P = 60.0  # BASELINE.json north star


def _time_stylize(stylizer, h, w, frames, batch=1):
    """Steady-state on-device throughput.

    Chains each frame's output into the next frame's input (same shape, valid
    [0,255] range) and syncs ONCE via a scalar value fetch. This defeats two
    tunnel-runtime artifacts: block_until_ready returning early, and
    per-frame host round-trips polluting the measurement.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32)
    reduce_fn = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    x = stylizer.stylize_batch(jax.device_put(img))
    x = stylizer.stylize_batch(x)  # warm both input signatures
    float(reduce_fn(x))  # compile + warmup, hard sync
    t0 = time.perf_counter()
    for _ in range(frames):
        x = stylizer.stylize_batch(x)  # chain device-resident frames
    float(reduce_fn(x))  # single sync
    dt = time.perf_counter() - t0
    return batch * frames / dt


def bench_inference(frames, precision="bfloat16"):
    import jax.numpy as jnp

    from faststyle_tpu.inference import Stylizer

    dtype = jnp.bfloat16 if precision == "bfloat16" else None
    stylizer = Stylizer(
        model_path=Path(__file__).parent / "weights" / "starry_final.npz",
        compute_dtype=dtype,
    )
    fps_1080 = _time_stylize(stylizer, 1080, 1920, frames)
    # small frames are fast (~1.4 ms): use enough of them that the single
    # sync round-trip (~100 ms on tunneled chips) stops dominating variance
    fps_512 = _time_stylize(stylizer, 512, 512, frames * 16)
    return fps_1080, fps_512


def bench_train_step(steps=20, precision="float32"):
    """Train step/sec at the reference recipe shapes (batch 4 @ 256px),
    synthetic data, random VGG (weights don't change the math's cost)."""
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

    config = TrainConfig.make(
        compute_dtype=jnp.bfloat16 if precision == "bfloat16" else None
    )
    vgg_params = vgg16.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    style = rng.uniform(0, 255, (1, 256, 256, 3)).astype(np.float32)
    grams = slow_style.style_target_grams(
        vgg_params, style, tuple(dict(config.style_weights))
    )
    step_fn = make_jitted_train_step(vgg_params, grams, config)
    state = init_state(jax.random.PRNGKey(1), config)
    # device-resident batch: real training overlaps host->device transfer via
    # data.pipeline.device_prefetch, so the step-rate metric excludes it
    batch = jax.device_put(rng.uniform(0, 255, (4, 256, 256, 3)).astype(np.float32))
    state, m = step_fn(state, batch)
    float(m["loss"])  # compile + hard sync (block_until_ready can lie on tunnels)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_fn(state, batch)  # state dependency chains the steps
    float(m["loss"])  # single sync
    return steps / (time.perf_counter() - t0)


def bench_slow_style(steps=100, precision="float32"):
    """Gatys pixel-optimization steps/sec at 256px (BASELINE config #2 —
    wall time for the 1000-step loop extrapolates as 1000/rate). Random VGG
    weights: identical compute cost to pretrained."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from faststyle_tpu.models import vgg16
    from faststyle_tpu.training import slow_style

    vgg_params = vgg16.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    content = rng.uniform(0, 255, (256, 256, 3)).astype(np.float32)
    style = rng.uniform(0, 255, (1, 256, 256, 3)).astype(np.float32)
    weights = dict(
        content_weights={"conv3_3": 1.0},
        style_weights={"conv1_2": 5.0, "conv2_2": 5.0, "conv3_3": 5.0, "conv4_3": 5.0},
        compute_dtype=jnp.bfloat16 if precision == "bfloat16" else None,
    )
    # steady-state rate from per-chunk log timestamps, skipping the first
    # chunk (it pays trace+compile); log_fn's loss fetch syncs each chunk
    stamps = []
    chunk = 10
    slow_style.optimize(
        vgg_params, content, style,
        num_steps=steps + chunk, log_every=chunk,
        log_fn=lambda step, loss: stamps.append((step, time.perf_counter())),
        **weights,
    )
    (s0, t0), (s1, t1) = stamps[1], stamps[-1]
    return (s1 - s0) / (t1 - t0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--precision", default="bfloat16", choices=["bfloat16", "float32"])
    args = parser.parse_args()

    from faststyle_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    frames = 10 if args.quick else 60
    fps_1080, fps_512 = bench_inference(frames, args.precision)
    details = {
        "stylize_512px_fps": round(fps_512, 2),
        "precision": args.precision,
    }
    if not args.skip_train:
        details["train_steps_per_sec_b4_256"] = round(
            bench_train_step(20 if args.quick else 100, args.precision), 3
        )
        rate = bench_slow_style(20 if args.quick else 100, args.precision)
        details["slow_style_steps_per_sec_256"] = round(rate, 2)
        details["slow_style_1000step_seconds"] = round(1000 / rate, 1)

    print(
        json.dumps(
            {
                "metric": "1080p_stylize_fps_per_chip",
                "value": round(fps_1080, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps_1080 / TARGET_FPS_1080P, 3),
                "details": details,
            }
        )
    )


if __name__ == "__main__":
    main()
