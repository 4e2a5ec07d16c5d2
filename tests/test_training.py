"""Training tests: loss decreases, checkpoint round-trip/resume, slow_style,
end-to-end loop on synthetic data (random VGG — math, not aesthetics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faststyle_tpu.models import vgg16
from faststyle_tpu.training import checkpoint as ckpt_lib
from faststyle_tpu.training import slow_style
from faststyle_tpu.training.train_step import (
    TrainConfig,
    init_state,
    make_jitted_train_step,
)

SIZE = 32


@pytest.fixture(scope="module")
def vgg_params():
    return vgg16.init_params(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def small_config():
    return TrainConfig.make(
        content_layers=("conv2_2",),
        content_weights=(1.0,),
        style_layers=("conv1_2", "conv2_2"),
        style_weights=(5.0, 5.0),
        beta=1e-6,
        learn_rate=1e-3,
    )


@pytest.fixture(scope="module")
def target_grams(vgg_params, small_config):
    rng = np.random.default_rng(0)
    style = rng.uniform(0, 255, (1, SIZE, SIZE, 3)).astype(np.float32)
    return slow_style.style_target_grams(
        vgg_params, style, tuple(dict(small_config.style_weights))
    )


@pytest.mark.slow
def test_train_step_decreases_loss(vgg_params, small_config, target_grams):
    step_fn = make_jitted_train_step(vgg_params, target_grams, small_config)
    state = init_state(jax.random.PRNGKey(1), small_config)
    rng = np.random.default_rng(1)
    batch = rng.uniform(0, 255, (2, SIZE, SIZE, 3)).astype(np.float32)
    losses = []
    for _ in range(12):
        state, metrics = step_fn(state, jnp.asarray(batch))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 12
    assert losses[-1] < losses[0] * 0.9, losses
    assert all(np.isfinite(l) for l in losses)


@pytest.mark.slow
def test_fused_content_tower_matches_separate(vgg_params, small_config, target_grams):
    """fused_content_tower (one VGG pass on [batch; y] to the split pool,
    then the y half alone) must be the same math as the two-tower form:
    identical metrics and identical updated params from the same state."""
    sep = make_jitted_train_step(vgg_params, target_grams, small_config)
    fused = make_jitted_train_step(
        vgg_params, target_grams, small_config, fused_content_tower=True
    )
    batch = jnp.asarray(
        np.random.default_rng(5).uniform(0, 255, (2, SIZE, SIZE, 3)).astype(np.float32)
    )
    state = init_state(jax.random.PRNGKey(2), small_config)
    # donate_argnums: give each call its own state copy
    s_sep, m_sep = sep(jax.tree.map(jnp.copy, state), batch)
    s_fused, m_fused = fused(jax.tree.map(jnp.copy, state), batch)
    for k in m_sep:
        np.testing.assert_allclose(
            float(m_fused[k]), float(m_sep[k]), rtol=1e-5, err_msg=k
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        s_sep.params,
        s_fused.params,
    )


@pytest.mark.slow
def test_fused_content_tower_with_deeper_style_layers(vgg_params):
    """Style layers deeper than the content split pool exercise the
    continuation pass (vgg16.apply input_layer=pool3)."""
    config = TrainConfig.make(
        content_layers=("conv3_3",),
        content_weights=(1.0,),
        style_layers=("conv1_2", "conv4_1"),
        style_weights=(5.0, 5.0),
    )
    rng = np.random.default_rng(0)
    style = rng.uniform(0, 255, (1, SIZE, SIZE, 3)).astype(np.float32)
    grams = slow_style.style_target_grams(
        vgg_params, style, tuple(dict(config.style_weights))
    )
    sep = make_jitted_train_step(vgg_params, grams, config)
    fused = make_jitted_train_step(vgg_params, grams, config, fused_content_tower=True)
    batch = jnp.asarray(rng.uniform(0, 255, (1, SIZE, SIZE, 3)).astype(np.float32))
    state = init_state(jax.random.PRNGKey(3), config)
    _, m_sep = sep(jax.tree.map(jnp.copy, state), batch)
    _, m_fused = fused(jax.tree.map(jnp.copy, state), batch)
    np.testing.assert_allclose(float(m_fused["loss"]), float(m_sep["loss"]), rtol=1e-5)


def test_metrics_decomposition(vgg_params, small_config, target_grams):
    step_fn = make_jitted_train_step(vgg_params, target_grams, small_config)
    state = init_state(jax.random.PRNGKey(1), small_config)
    batch = np.random.default_rng(0).uniform(0, 255, (1, SIZE, SIZE, 3)).astype(np.float32)
    _, m = step_fn(state, jnp.asarray(batch))
    np.testing.assert_allclose(
        float(m["loss"]),
        float(m["content_loss"]) + float(m["style_loss"]) + float(m["tv_loss"]),
        rtol=1e-5,
    )


@pytest.mark.slow  # 24 s; fast lane keeps the f32 train-step coverage
def test_train_step_bfloat16_compute(vgg_params, target_grams):
    """bf16 compute_dtype must train (regression: preferred_element_type=f32
    on bf16 convs broke lax's conv transpose rule under autodiff)."""
    config = TrainConfig.make(
        content_layers=("conv2_2",),
        content_weights=(1.0,),
        style_layers=("conv1_2", "conv2_2"),
        style_weights=(5.0, 5.0),
        beta=1e-6,
        learn_rate=1e-3,
        compute_dtype=jnp.bfloat16,
    )
    step_fn = make_jitted_train_step(vgg_params, target_grams, config)
    state = init_state(jax.random.PRNGKey(1), config)
    batch = np.random.default_rng(1).uniform(0, 255, (2, SIZE, SIZE, 3)).astype(np.float32)
    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, jnp.asarray(batch))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


@pytest.mark.slow  # 18 s; deconv parity also pinned by the TF golden oracle
def test_train_step_deconv_variant(vgg_params, target_grams):
    """The 'deconv' upsampling variant must train (transposed-conv grads)."""
    config = TrainConfig.make(
        content_layers=("conv2_2",),
        content_weights=(1.0,),
        style_layers=("conv1_2", "conv2_2"),
        style_weights=(5.0, 5.0),
        beta=1e-4,  # the recipe recommends TV reg for deconv (train.py:89-91)
        learn_rate=1e-3,
        upsample_method="deconv",
    )
    step_fn = make_jitted_train_step(vgg_params, target_grams, config)
    state = init_state(jax.random.PRNGKey(2), config)
    batch = np.random.default_rng(3).uniform(0, 255, (2, SIZE, SIZE, 3)).astype(np.float32)
    for _ in range(3):
        state, metrics = step_fn(state, jnp.asarray(batch))
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(tmp_path, small_config):
    state = init_state(jax.random.PRNGKey(2), small_config)
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    ckpt_lib.save(tmp_path, state)
    template = init_state(jax.random.PRNGKey(3), small_config)
    restored = ckpt_lib.restore_latest(tmp_path, template)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_retention(tmp_path, small_config):
    state = init_state(jax.random.PRNGKey(2), small_config)
    for s in range(8):
        ckpt_lib.save(tmp_path, state._replace(step=jnp.asarray(s, jnp.int32)), keep=3)
    assert sorted(ckpt_lib.all_steps(tmp_path)) == [5, 6, 7]


def test_slow_style_decreases_loss(vgg_params):
    rng = np.random.default_rng(0)
    content = rng.uniform(0, 255, (SIZE, SIZE, 3)).astype(np.float32)
    style = rng.uniform(0, 255, (SIZE, SIZE, 3)).astype(np.float32)
    losses_seen = []
    out = slow_style.optimize(
        vgg_params,
        content,
        style[None],
        content_weights={"conv2_2": 1.0},
        style_weights={"conv1_2": 5.0},
        beta=1e-4,
        learn_rate=1e1,
        num_steps=40,
        log_every=10,
        log_fn=lambda step, loss: losses_seen.append(loss),
    )
    assert out.shape == (SIZE, SIZE, 3)
    assert losses_seen[-1] < losses_seen[0]
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_train_loop_end_to_end(tmp_path, vgg_params, small_config):
    """Full loop: pipeline batches -> steps -> ckpt -> final npz -> resume."""
    from faststyle_tpu.training import loop
    from faststyle_tpu.utils.logging import MetricsLogger

    rng = np.random.default_rng(0)
    style = rng.uniform(0, 255, (SIZE, SIZE, 3)).astype(np.float32)
    batches = [rng.uniform(0, 255, (2, SIZE, SIZE, 3)).astype(np.float32) for _ in range(6)]

    logger = MetricsLogger(tmp_path / "summaries", "run0", echo=False)
    state = loop.train(
        vgg_params=vgg_params,
        style_img=style,
        batches=iter(batches),
        config=small_config,
        model_name="tiny",
        num_steps_ckpt=4,
        log_every=2,
        train_root=tmp_path / "training",
        models_root=tmp_path / "models",
        summaries_root=tmp_path / "summaries",
        logger=logger,
    )
    assert int(state.step) == 6
    assert (tmp_path / "models" / "tiny_final.npz").exists()
    assert ckpt_lib.all_steps(tmp_path / "training" / "tiny") == [4]
    assert (tmp_path / "summaries" / "run0" / "metrics.csv").read_text().count("\n") >= 3

    # resume picks up from the checkpoint
    logger2 = MetricsLogger(tmp_path / "summaries", "run1", echo=False)
    state2 = loop.train(
        vgg_params=vgg_params,
        style_img=style,
        batches=iter(batches[:2]),
        config=small_config,
        model_name="tiny",
        train_root=tmp_path / "training",
        models_root=tmp_path / "models",
        summaries_root=tmp_path / "summaries",
        resume=True,
        logger=logger2,
    )
    assert int(state2.step) == 6  # 4 (restored) + 2


@pytest.mark.slow  # 18 s end-to-end train->save->serve; cli_e2e covers it too
def test_final_npz_loads_into_stylizer(tmp_path, vgg_params, small_config):
    from faststyle_tpu.inference import Stylizer
    from faststyle_tpu.training import loop
    from faststyle_tpu.utils.logging import MetricsLogger

    rng = np.random.default_rng(0)
    style = rng.uniform(0, 255, (SIZE, SIZE, 3)).astype(np.float32)
    loop.train(
        vgg_params=vgg_params,
        style_img=style,
        batches=iter([rng.uniform(0, 255, (1, SIZE, SIZE, 3)).astype(np.float32)]),
        config=small_config,
        model_name="mini",
        train_root=tmp_path / "training",
        models_root=tmp_path / "models",
        summaries_root=tmp_path / "summaries",
        logger=MetricsLogger(tmp_path / "summaries", "x", echo=False),
    )
    s = Stylizer(model_path=tmp_path / "models" / "mini_final.npz")
    out = s(rng.uniform(0, 255, (SIZE, SIZE, 3)).astype(np.float32))
    assert out.shape == (SIZE, SIZE, 3)
    assert out.dtype == np.uint8


def test_metrics_logger_resume_conforms_to_existing_header(tmp_path):
    """Resuming into an existing metrics.csv must keep columns aligned even
    when the resumed run logs a different metric dict (new keys dropped,
    absent keys left empty) — the round-2 behavior silently misaligned."""
    import csv

    from faststyle_tpu.utils.logging import MetricsLogger

    log1 = MetricsLogger(tmp_path, "runA", echo=False)
    log1.log(1, {"loss": 1.0, "style_loss": 2.0})
    log1.log(2, {"loss": 0.5, "style_loss": 1.0})
    log1.close()

    # same run dir = resume; different key order + new key + missing key
    log2 = MetricsLogger(tmp_path, "runA", echo=False)
    log2.log(3, {"style_loss": 0.7, "loss": 0.3, "brand_new": 9.0})
    log2.log(4, {"loss": 0.2})
    log2.close()

    with open(tmp_path / "runA" / "metrics.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    assert [r["step"] for r in rows] == ["1", "2", "3", "4"]
    assert rows[2]["loss"] == "0.3" and rows[2]["style_loss"] == "0.7"
    assert "brand_new" not in rows[0]  # header unchanged by the resumed run
    assert rows[3]["style_loss"] == ""  # absent key -> empty cell, not shift


@pytest.mark.slow  # default-off knob (docs/PERF.md dead end); 27 s
def test_fused_content_tower_pool_loss_layer(vgg_params):
    """A pool layer that is ITSELF a loss layer may coincide with the fused
    tower's split pool — it must stay in the loss dict (regression: the
    continuation unconditionally popped it)."""
    config = TrainConfig.make(
        content_layers=("pool2",),
        content_weights=(1.0,),
        style_layers=("conv1_2", "conv3_3"),
        style_weights=(5.0, 5.0),
    )
    rng = np.random.default_rng(0)
    style = rng.uniform(0, 255, (1, SIZE, SIZE, 3)).astype(np.float32)
    grams = slow_style.style_target_grams(
        vgg_params, style, tuple(dict(config.style_weights))
    )
    sep = make_jitted_train_step(vgg_params, grams, config)
    fused = make_jitted_train_step(vgg_params, grams, config, fused_content_tower=True)
    batch = jnp.asarray(rng.uniform(0, 255, (1, SIZE, SIZE, 3)).astype(np.float32))
    state = init_state(jax.random.PRNGKey(3), config)
    _, m_sep = sep(jax.tree.map(jnp.copy, state), batch)
    _, m_fused = fused(jax.tree.map(jnp.copy, state), batch)
    np.testing.assert_allclose(float(m_fused["loss"]), float(m_sep["loss"]), rtol=1e-5)


def test_restore_latest_falls_back_past_corrupt_newest(tmp_path, small_config, capsys):
    """A half-written newest checkpoint (crash mid-save on a pre-fsync
    kernel) must not brick --resume: fall back to the next-oldest readable
    one — that is what retention keeps them for."""
    state = init_state(jax.random.PRNGKey(2), small_config)
    ckpt_lib.save(tmp_path, state._replace(step=jnp.asarray(3, jnp.int32)))
    ckpt_lib.save(tmp_path, state._replace(step=jnp.asarray(5, jnp.int32)))
    (tmp_path / "step_5" / "state.npz").write_bytes(b"not a zipfile")
    template = init_state(jax.random.PRNGKey(3), small_config)
    restored = ckpt_lib.restore_latest(tmp_path, template)
    assert int(restored.step) == 3
    assert "unreadable" in capsys.readouterr().out


def test_train_step_style_only_config(vgg_params, target_grams):
    """Style-only training (no content layers) is a legitimate config
    (texture synthesis; cli --loss_content_layers accepts zero): the step
    must run, not crash in the split-pool/target computation."""
    config = TrainConfig.make(
        content_layers=(),
        content_weights=(),
        style_layers=("conv1_2", "conv2_2"),
        style_weights=(5.0, 5.0),
    )
    step_fn = make_jitted_train_step(vgg_params, target_grams, config)
    state = init_state(jax.random.PRNGKey(1), config)
    batch = np.random.default_rng(0).uniform(0, 255, (1, SIZE, SIZE, 3)).astype(np.float32)
    state, m = step_fn(state, jnp.asarray(batch))
    assert float(m["content_loss"]) == 0.0
    assert np.isfinite(float(m["loss"])) and float(m["style_loss"]) > 0
