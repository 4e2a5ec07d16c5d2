"""Validation tooling: corpus generator, random-VGG writer, distill step."""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def test_make_training_images(tmp_path):
    out = subprocess.run(
        [sys.executable, str(REPO / "tools/make_training_images.py"),
         str(tmp_path / "imgs"), "--num", "12", "--size", "64"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    files = sorted((tmp_path / "imgs").glob("*.jpg"))
    assert len(files) == 12
    from faststyle_tpu.utils import image_io

    img = image_io.imread(files[0])
    assert img.shape == (64, 64, 3)
    # chicago is held out by default: corpus must be deterministic
    out2 = subprocess.run(
        [sys.executable, str(REPO / "tools/make_training_images.py"),
         str(tmp_path / "imgs2"), "--num", "12", "--size", "64"],
        capture_output=True, text=True, timeout=120,
    )
    assert out2.returncode == 0, out2.stderr
    a = (tmp_path / "imgs" / "img_00000.jpg").read_bytes()
    b = (tmp_path / "imgs2" / "img_00000.jpg").read_bytes()
    assert a == b


@pytest.mark.slow
def test_make_random_vgg_loadable(tmp_path):
    out = subprocess.run(
        [sys.executable, str(REPO / "tools/make_random_vgg.py"),
         str(tmp_path / "vgg.npz")],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    from faststyle_tpu.models import vgg16

    params = vgg16.load_npz(tmp_path / "vgg.npz")
    acts = vgg16.apply(params, jnp.zeros((1, 64, 64, 3)), ("conv1_2",))
    assert acts["conv1_2"].shape == (1, 64, 64, 64)


@pytest.mark.slow
def test_distill_step_decreases_loss():
    sys.path.insert(0, str(REPO / "tools"))
    import distill_validation as DV
    from faststyle_tpu.models import transform_net

    teacher = transform_net.init_params(jax.random.PRNGKey(42))
    student = transform_net.init_params(jax.random.PRNGKey(0))
    step_fn, opt = DV.make_distill_step(1e-3, None, decay_steps=10, ema_decay=0.99)
    opt_state = opt.init(student)
    ema = jax.tree.map(jnp.copy, student)
    batch = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (2, 64, 64, 3)), jnp.float32
    )
    losses, pix = [], []
    for _ in range(6):
        student, ema, opt_state, (loss, pix_raw) = step_fn(
            student, ema, opt_state, teacher, batch
        )
        losses.append(float(loss))
        pix.append(float(pix_raw))
    assert losses[-1] < losses[0]
    assert pix[-1] < pix[0]  # the feature terms must pull the output too
    assert np.isfinite(losses).all() and np.isfinite(pix).all()
    # the Polyak average must lag the raw student (it is a distinct artifact)
    gaps = jax.tree.leaves(
        jax.tree.map(lambda e, p: jnp.abs(e - p).max(), ema, student)
    )
    assert max(float(g) for g in gaps) > 0
