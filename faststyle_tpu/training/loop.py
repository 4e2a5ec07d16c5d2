"""Training loop: style targets -> jitted step over the input pipeline.

Orchestrates what the reference's train.py main() does across two sessions
and four Session.runs per step (SURVEY.md §3.2) as: precompute target Grams
(one jitted call), then a single jitted/shard_mapped train step consuming
device-prefetched batches, with periodic checkpoints, CSV metrics, resume,
and a final weights-only save.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from faststyle_tpu import inference
from faststyle_tpu.training import checkpoint as ckpt_lib
from faststyle_tpu.training import slow_style
from faststyle_tpu.training.train_step import TrainConfig, init_state, make_jitted_train_step
from faststyle_tpu.utils.logging import MetricsLogger


def train(
    *,
    vgg_params,
    style_img: np.ndarray,
    batches,
    config: TrainConfig,
    model_name: str = "model",
    seed: int = 0,
    num_steps_ckpt: int = 1000,
    num_steps_break: int = -1,
    log_every: int = 10,
    train_root: str | Path = "training",
    models_root: str | Path = "models",
    summaries_root: str | Path = "summaries/train",
    run_name: Optional[str] = None,
    resume: bool = False,
    mesh=None,
    logger: Optional[MetricsLogger] = None,
):
    """Run perceptual-loss training; returns the final TrainState.

    `batches` is any iterator of NHWC float32 [0,255] arrays (see
    data.pipeline). With `mesh`, the step runs data-parallel via
    parallel.data_parallel over the mesh's 'data' axis.
    """
    from faststyle_tpu.utils.logging import unique_run_name

    style_layers = tuple(dict(config.style_weights))
    target_grams = slow_style.style_target_grams(
        vgg_params, np.asarray(style_img, np.float32)[None], style_layers
    )

    state = init_state(jax.random.PRNGKey(seed), config)
    ckpt_dir = Path(train_root) / model_name
    if resume:
        restored = ckpt_lib.restore_latest(ckpt_dir, state)
        if restored is not None:
            state = restored
            print(f"[train] resumed from step {int(state.step)}")

    if mesh is not None:
        from faststyle_tpu.parallel import data_parallel

        step_fn = data_parallel.make_dp_train_step(vgg_params, target_grams, config, mesh)
    else:
        step_fn = make_jitted_train_step(vgg_params, target_grams, config)

    if logger is None:
        run = run_name or unique_run_name(summaries_root, model_name)
        logger = MetricsLogger(summaries_root, run)

    final_state = state
    # host-side step counter: reading state.step from device every iteration
    # would force a sync per step and stall the async dispatch pipeline
    step = int(state.step)

    # Deferred metric fetch: float(metric) at the log tick would block on
    # the step that just dispatched — a full pipeline sync every log_every
    # steps (~80-100 ms RTT on a tunneled runtime, measured ~5-7% of wall
    # time at 72 steps/s). Instead hold the device arrays one tick and
    # convert them at the NEXT tick, when they are long since computed and
    # the fetch costs only the transfer of a few scalars.
    # Every row carries the timestamp of ITS OWN dispatch tick (at_time), so
    # steps_per_sec always measures tick-to-tick intervals — without this the
    # flushed row would be stamped at the NEXT tick (or after a checkpoint
    # save), distorting the rate around every flush.
    pending: Optional[tuple] = None

    def flush_pending():
        nonlocal pending
        if pending is not None:
            p_step, p_metrics, p_time = pending
            logger.log(
                p_step, {k: float(v) for k, v in p_metrics.items()}, at_time=p_time
            )
            pending = None

    try:
        for batch in batches:
            if num_steps_break >= 0 and step >= num_steps_break:
                print("Done training.")
                break
            final_state, metrics = step_fn(final_state, batch)
            step += 1
            if num_steps_ckpt > 0 and step % num_steps_ckpt == 0:
                # device_get(state) below syncs anyway — log directly (but
                # stamp the row before the save so its rate excludes it)
                flush_pending()
                tick = time.perf_counter()
                ckpt_lib.save(ckpt_dir, jax.device_get(final_state))
                logger.log(
                    step, {k: float(v) for k, v in metrics.items()}, at_time=tick
                )
            elif log_every > 0 and step % log_every == 0:
                flush_pending()
                pending = (step, metrics, time.perf_counter())
        else:
            print("Done training (epochs exhausted).")
        flush_pending()
        # Save final weights only on a clean finish: on failure the state's
        # donated buffers are already deleted, and overwriting a previous
        # good <model>_final.npz with a crashed run's weights would destroy
        # a good artifact — the periodic checkpoints are the recovery story.
        models_root = Path(models_root)
        models_root.mkdir(parents=True, exist_ok=True)
        final = jax.device_get(final_state)
        inference.save_params(models_root / f"{model_name}_final.npz", final.params)
        print(f"[train] final weights -> {models_root / (model_name + '_final.npz')}")
    finally:
        logger.close()
    return final_state
