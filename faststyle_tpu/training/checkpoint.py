"""Checkpoint / resume for training state.

The reference saves full-graph TF checkpoints every `num_steps_ckpt` and a
final weights-only checkpoint (train.py:224-225, 256-259, 286) but has no
resume path. Here both periodic state (params + Adam state + step, as a
flat treepath-keyed `.npz` in an atomically-renamed step dir) and the final
weights-only `.npz` are first-class, and `restore_latest`
gives real crash-resume — the framework's failure-recovery story
(SURVEY.md §5).
"""

from __future__ import annotations

import os
import re
import shutil
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from faststyle_tpu.training.train_step import TrainState

_STEP_RE = re.compile(r"step_(\d+)$")


class CheckpointMismatch(ValueError):
    """A readable checkpoint whose leaves don't fit the template (wrong
    model/config) — NOT file corruption, so restore_latest must not skip
    past it to an older checkpoint."""


def _flatten(tree) -> dict:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def save(ckpt_dir: str | Path, state: TrainState, *, keep: int = 5) -> Path:
    """Write `<ckpt_dir>/step_<N>/state.npz` (leaves keyed by treepath)."""
    step = int(state.step)
    path = Path(ckpt_dir) / f"step_{step}"
    tmp = path.with_name(path.name + ".tmp")
    tmp.mkdir(parents=True, exist_ok=True)
    with open(tmp / "state.npz", "wb") as f:
        np.savez(f, **_flatten(state))
        # flush data blocks before the rename publishes the dir: rename-then-
        # crash must never leave a step_<N> whose state.npz is empty/partial
        f.flush()
        os.fsync(f.fileno())
    if path.exists():
        shutil.rmtree(path, ignore_errors=True)
    try:
        tmp.rename(path)
    except OSError:
        # two trainers sharing training/<model_name> can race the rmtree
        # above (the dir is keyed by model name, as in the reference);
        # replace the other run's entry instead of dying mid-train
        shutil.rmtree(path, ignore_errors=True)
        tmp.rename(path)
    # retention
    steps = sorted(all_steps(ckpt_dir))
    for old in steps[:-keep]:
        shutil.rmtree(Path(ckpt_dir) / f"step_{old}", ignore_errors=True)
    return path


def all_steps(ckpt_dir: str | Path) -> list[int]:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return []
    out = []
    for p in ckpt_dir.iterdir():
        m = _STEP_RE.search(p.name)
        if m and p.is_dir():
            out.append(int(m.group(1)))
    return out


def restore(ckpt_dir: str | Path, step: int, template: TrainState) -> TrainState:
    """Restore a state saved by `save`, using `template` for the tree structure."""
    data = np.load(Path(ckpt_dir) / f"step_{step}" / "state.npz")
    leaves_template, treedef = jax.tree_util.tree_flatten(template)
    flat_paths = [
        jax.tree_util.keystr(path)
        for path, _ in jax.tree_util.tree_flatten_with_path(template)[0]
    ]
    leaves = []
    for key, tmpl in zip(flat_paths, leaves_template):
        arr = data[key]
        if arr.shape != np.shape(tmpl):
            raise CheckpointMismatch(
                f"checkpoint leaf {key} shape {arr.shape} != template {np.shape(tmpl)}"
            )
        tmpl_dtype = np.result_type(tmpl)
        if arr.dtype != tmpl_dtype:
            raise CheckpointMismatch(
                f"checkpoint leaf {key} dtype {arr.dtype} != template {tmpl_dtype}"
            )
        leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def restore_latest(ckpt_dir: str | Path, template: TrainState) -> Optional[TrainState]:
    """Restore the newest READABLE checkpoint: an unreadable newest dir
    (half-written by a crash predating the fsync above, bit-rot) falls back
    to the next-oldest instead of permanently bricking --resume — the whole
    point of keeping `keep` checkpoints."""
    steps = sorted(all_steps(ckpt_dir), reverse=True)
    if not steps:
        return None
    last_err: Exception | None = None
    for step in steps:
        try:
            return restore(ckpt_dir, step, template)
        except CheckpointMismatch:
            raise  # wrong template/model, not corruption
        except Exception as e:  # unreadable npz: try the next-oldest
            print(f"[checkpoint] step_{step} unreadable ({e}); trying older")
            last_err = e
    raise RuntimeError(f"no readable checkpoint in {ckpt_dir}") from last_err
