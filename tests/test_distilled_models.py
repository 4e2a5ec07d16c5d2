"""Regression anchors for the shipped from-scratch-trained (distilled) models.

`models/{starry,candy}_distilled.npz` are the repo's trained-model
deliverable (docs/TRAINED_MODEL.md): fresh transform nets trained through the
real pipeline against the shipped teachers, held-out student-vs-teacher SSIM
0.993-0.998 at train time (round 4: teacher-forced layerwise phase, then
end-to-end feature+Gram fine-tune with Polyak EMA). These tests pin that
contract so a future change to
the ops/packed path (or a corrupted asset) can't silently regress the
artifact: the students must still load, still run, and still track their
teachers on the held-out image at the documented margin.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from faststyle_tpu.inference import load_params
from faststyle_tpu.models import transform_net
from faststyle_tpu.utils.metrics import ssim

from conftest import WEIGHTS

REPO = WEIGHTS.parent


@pytest.mark.parametrize("style", ["starry", "candy"])
def test_distilled_tracks_teacher_at_256(style, chicago_crop256):
    """Held-out SSIM vs the teacher >= 0.98 (VERDICT r3 target was >= 0.95;
    round-4 recipe measures 0.9935 starry / 0.9989 candy on this exact crop
    in CPU f32, docs/TRAINED_MODEL.md)."""
    student = load_params(REPO / "models" / f"{style}_distilled.npz")
    teacher = load_params(REPO / "models" / f"{style}_final.npz")
    x = jnp.asarray(chicago_crop256, jnp.float32)[None]
    s = np.clip(np.asarray(transform_net.apply(student, x))[0], 0, 255)
    t = np.clip(np.asarray(transform_net.apply(teacher, x))[0], 0, 255)
    score = ssim(s, t)
    assert score >= 0.98, f"{style} student-vs-teacher SSIM {score:.4f}"
    # and the student is genuinely styled, not an identity net: it must sit
    # far closer to the teacher than the unstylized input does
    baseline = ssim(np.asarray(chicago_crop256, np.float64), t)
    assert score > baseline + 0.1, (
        f"{style}: student SSIM {score:.4f} vs input-baseline {baseline:.4f}"
    )
