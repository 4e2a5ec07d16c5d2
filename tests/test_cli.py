"""CLI surface tests: flag names/defaults match the reference parsers
(train.py:23-105, stylize_image.py:19-43, stylize_webcam.py:17-38,
slow_style.py:17-67 — the public API contract per SURVEY.md §5)."""

import importlib.util
import sys
from pathlib import Path

import pytest

CLI = Path(__file__).parent.parent / "cli"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, CLI / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _defaults(parser):
    return {a.dest: a.default for a in parser._actions if a.dest != "help"}


def test_train_flags_match_reference():
    d = _defaults(_load("train").setup_parser())
    # the reference's exact flag set and defaults (train.py:23-105)
    assert d["style_img_path"] == "./style_images/starry_night_crop.jpg"
    assert d["learn_rate"] == 1e-3
    assert d["batch_size"] == 4
    assert d["n_epochs"] == 2
    assert d["preprocess_size"] == [256, 256]
    assert d["run_name"] is None
    assert d["loss_content_layers"] == ["conv3_3"]
    assert d["loss_style_layers"] == ["conv1_2", "conv2_2", "conv3_3", "conv4_3"]
    assert d["content_weights"] == [1.0]
    assert d["style_weights"] == [5.0, 5.0, 5.0, 5.0]
    assert d["num_steps_ckpt"] == 1000
    assert d["num_pipe_buffer"] == 4000
    assert d["num_steps_break"] == -1
    assert d["beta"] == 0.0
    assert d["style_target_resize"] == 1.0
    assert d["upsample_method"] == "resize"


def test_stylize_image_flags_match_reference():
    d = _defaults(_load("stylize_image").setup_parser())
    assert d["output_img_path"] == "./results/styled.jpg"
    assert d["model_path"] == "./models/starry_final.ckpt"
    assert d["content_target_resize"] == 1.0
    assert d["upsample_method"] == "resize"


def test_stylize_webcam_flags_match_reference():
    d = _defaults(_load("stylize_webcam").setup_parser())
    assert d["model_path"] == "./models/starry_final.ckpt"
    assert d["upsample_method"] == "resize"
    assert d["resolution"] is None


def test_slow_style_flags_match_reference():
    d = _defaults(_load("slow_style").setup_parser())
    assert d["learn_rate"] == 1e1
    assert d["loss_content_layers"] == ["conv3_3"]
    assert d["loss_style_layers"] == ["conv1_2", "conv2_2", "conv3_3", "conv4_3"]
    assert d["content_weights"] == [1.0]
    assert d["style_weights"] == [5.0, 5.0, 5.0, 5.0]
    assert d["num_steps_break"] == 500
    assert d["beta"] == 1e-4
    assert d["style_target_resize"] == 1.0
    assert d["cont_target_resize"] == 1.0
    assert d["output_img_path"] == "./out.jpg"


def test_tfrecords_writer_flags_match_reference():
    d = _defaults(_load("tfrecords_writer").setup_parser())
    assert d["train_directory"] == "/tmp/"
    assert d["output_directory"] == "/tmp/"
    assert d["train_shards"] == 2
    assert d["num_threads"] == 2
