"""End-to-end CLI runs (in-process, on the test CPU backend).

Each test drives a CLI main() through sys.argv exactly as a user would,
covering the full wiring: flags -> pipeline -> model -> artifacts on disk.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

# in-process CLI e2e drives compile real nets per test: full lane only
pytestmark = pytest.mark.slow

ROOT = Path(__file__).parent.parent
CLI = ROOT / "cli"


def _run(name, argv, monkeypatch):
    spec = importlib.util.spec_from_file_location(f"clie2e_{name}", CLI / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [f"{name}.py"] + argv)
    mod.main()


@pytest.fixture()
def vgg_npz(tmp_path):
    from faststyle_tpu.models import vgg16

    rng = np.random.default_rng(0)
    data = {}
    cin = 3
    for gi, group in enumerate(vgg16._GROUPS, start=1):
        cout = vgg16._CHANNELS[gi]
        for name in group:
            data[f"{name}_W"] = (rng.standard_normal((3, 3, cin, cout)) * 0.05).astype(np.float32)
            data[f"{name}_b"] = np.zeros(cout, np.float32)
            cin = cout
    path = tmp_path / "vgg16_weights.npz"
    np.savez(path, **data)
    return path


@pytest.fixture()
def image_dir(tmp_path):
    from faststyle_tpu.utils import image_io

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        image_io.imwrite(d / f"im{i}.jpg", rng.integers(0, 255, (48, 56, 3), dtype=np.uint8))
    return d


def test_stylize_image_cli(tmp_path, monkeypatch):
    out = tmp_path / "styled.png"
    _run(
        "stylize_image",
        [
            "--input_img_path", str(ROOT / "tests/assets/chicago_crop256.png"),
            "--output_img_path", str(out),
            "--model_path", str(ROOT / "models/starry_final.npz"),
            "--content_target_resize", "0.25",
        ],
        monkeypatch,
    )
    from faststyle_tpu.utils import image_io

    img = image_io.imread(out)
    assert img.shape == (64, 64, 3)


def test_tfrecords_writer_and_train_cli(tmp_path, monkeypatch, vgg_npz, image_dir):
    records = tmp_path / "records"
    _run(
        "tfrecords_writer",
        ["--train_directory", str(image_dir), "--output_directory", str(records)],
        monkeypatch,
    )
    assert len(list(records.glob("train-*"))) == 2

    monkeypatch.chdir(tmp_path)  # train writes ./training ./models ./summaries
    _run(
        "train",
        [
            "--train_dir", str(records),
            "--model_name", "e2e",
            "--style_img_path", str(ROOT / "tests/assets/candy.jpg"),
            "--style_target_resize", "0.1",
            "--vgg_path", str(vgg_npz),
            "--batch_size", "2",
            "--preprocess_size", "32", "32",
            "--num_steps_break", "3",
            "--num_steps_ckpt", "2",
            "--num_pipe_buffer", "2",
            "--n_epochs", "4",
        ],
        monkeypatch,
    )
    assert (tmp_path / "models/e2e_final.npz").exists()
    assert list((tmp_path / "training/e2e").glob("step_*"))


def test_slow_style_cli(tmp_path, monkeypatch, vgg_npz):
    out = tmp_path / "out.jpg"
    _run(
        "slow_style",
        [
            "--style_img_path", str(ROOT / "tests/assets/candy.jpg"),
            "--cont_img_path", str(ROOT / "tests/assets/chicago_crop256.png"),
            "--style_target_resize", "0.1",
            "--cont_target_resize", "0.25",
            "--vgg_path", str(vgg_npz),
            "--num_steps_break", "12",
            "--output_img_path", str(out),
        ],
        monkeypatch,
    )
    assert out.exists()


def test_stylize_webcam_synthetic_cli(monkeypatch, capsys):
    _run(
        "stylize_webcam",
        [
            "--model_path", str(ROOT / "models/starry_final.npz"),
            "--num_synthetic_frames", "3",
            "--resolution", "64", "48",
            "--precision", "float32",
        ],
        monkeypatch,
    )
    assert "fps" in capsys.readouterr().out


def test_stylize_image_spatial(tmp_path, monkeypatch):
    """--spatial shards one frame's rows over the 8-device test mesh and
    matches the plain single-device CLI output."""
    from faststyle_tpu.utils import image_io

    rng = np.random.default_rng(0)
    src = tmp_path / "in.png"
    image_io.imwrite(src, rng.integers(0, 256, (128, 96, 3), dtype=np.uint8))
    out_a = tmp_path / "spatial.png"
    out_b = tmp_path / "plain.png"
    model = str(ROOT / "models" / "starry_final.npz")
    _run(
        "stylize_image",
        ["--input_img_path", str(src), "--output_img_path", str(out_a),
         "--model_path", model, "--spatial"],
        monkeypatch,
    )
    _run(
        "stylize_image",
        ["--input_img_path", str(src), "--output_img_path", str(out_b),
         "--model_path", model],
        monkeypatch,
    )
    a = image_io.imread(out_a).astype(int)
    b = image_io.imread(out_b).astype(int)
    assert a.shape == (128, 96, 3)
    assert np.abs(a - b).max() <= 1  # truncation-boundary flips only


def test_stylize_image_spatial_deconv(tmp_path, monkeypatch):
    """--spatial accepts 'deconv' models (round-4 fix: a stale guard at
    cli/stylize_image.py used to refuse them even though parallel.spatial
    supports the deconv phase decomposition)."""
    import jax

    from faststyle_tpu.inference import save_params
    from faststyle_tpu.models import transform_net
    from faststyle_tpu.utils import image_io

    model = tmp_path / "deconv.npz"
    save_params(model, transform_net.init_params(jax.random.PRNGKey(3), "deconv"))
    rng = np.random.default_rng(1)
    src = tmp_path / "in.png"
    image_io.imwrite(src, rng.integers(0, 256, (128, 96, 3), dtype=np.uint8))
    out_a = tmp_path / "spatial.png"
    out_b = tmp_path / "plain.png"
    for out, extra in ((out_a, ["--spatial"]), (out_b, [])):
        _run(
            "stylize_image",
            ["--input_img_path", str(src), "--output_img_path", str(out),
             "--model_path", str(model), "--upsample_method", "deconv"] + extra,
            monkeypatch,
        )
    a = image_io.imread(out_a).astype(int)
    b = image_io.imread(out_b).astype(int)
    assert a.shape == (128, 96, 3)
    assert np.abs(a - b).max() <= 1  # truncation-boundary flips only


def test_stylize_webcam_packed_fetch(monkeypatch, capsys):
    _run(
        "stylize_webcam",
        [
            "--model_path", str(ROOT / "models/starry_final.npz"),
            "--num_synthetic_frames", "3",
            "--resolution", "64", "48",
            "--precision", "float32",
            "--packed_fetch",
        ],
        monkeypatch,
    )
    assert "fps" in capsys.readouterr().out


def test_stylize_webcam_pipeline_depth_and_latency(monkeypatch, capsys):
    """--pipeline_depth keeps N frames in flight; --report_latency prints
    per-frame induced p50/p99 (docs/SERVING.md latency/throughput trade)."""
    _run(
        "stylize_webcam",
        [
            "--model_path", str(ROOT / "models/starry_final.npz"),
            "--num_synthetic_frames", "5",
            "--resolution", "64", "48",
            "--precision", "float32",
            "--pipeline_depth", "3",
            "--report_latency",
        ],
        monkeypatch,
    )
    out = capsys.readouterr().out
    assert "5 frames" in out and "fps" in out
    assert "latency p50" in out and "p99" in out


def test_stylize_webcam_video_pipeline_depth_exact_count(tmp_path, monkeypatch):
    """The depth-bounded in-flight queue must still emit every frame exactly
    once when the source ends mid-pipeline (drain path) and respect
    --max_frames with frames in flight."""
    cv2 = pytest.importorskip("cv2")

    src = tmp_path / "src.avi"
    wr = cv2.VideoWriter(str(src), cv2.VideoWriter_fourcc(*"XVID"), 5.0, (64, 48))
    rng = np.random.default_rng(0)
    for _ in range(5):
        wr.write(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8))
    wr.release()

    def frames_in(path):
        cap = cv2.VideoCapture(str(path))
        n = 0
        while cap.read()[0]:
            n += 1
        cap.release()
        return n

    # depth 3 > remaining source frames exercises the end-of-stream drain;
    # max_frames 4 < source length exercises the bound with a full pipeline
    for max_frames, want in ((-1, 5), (4, 4)):
        out = tmp_path / f"out_d3_{max_frames}.avi"
        _run(
            "stylize_webcam",
            [
                "--model_path", str(ROOT / "models/starry_final.npz"),
                "--video_path", str(src),
                "--output_path", str(out),
                "--max_frames", str(max_frames),
                "--pipeline_depth", "3",
                "--no_display",
                "--precision", "float32",
            ],
            monkeypatch,
        )
        assert frames_in(out) == want, (max_frames, want)


def test_stylize_webcam_video_max_frames(tmp_path, monkeypatch):
    """--video_path source with --max_frames N processes exactly N frames;
    N=0 writes an empty output (review r3: it used to dispatch-then-emit 1)."""
    cv2 = pytest.importorskip("cv2")

    src = tmp_path / "src.avi"
    wr = cv2.VideoWriter(
        str(src), cv2.VideoWriter_fourcc(*"XVID"), 5.0, (64, 48)
    )
    rng = np.random.default_rng(0)
    for _ in range(5):
        wr.write(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8))
    wr.release()

    def frames_in(path):
        cap = cv2.VideoCapture(str(path))
        n = 0
        while cap.read()[0]:
            n += 1
        cap.release()
        return n

    for max_frames, want in ((0, 0), (2, 2)):
        out = tmp_path / f"out_{max_frames}.avi"
        _run(
            "stylize_webcam",
            [
                "--model_path", str(ROOT / "models/starry_final.npz"),
                "--video_path", str(src),
                "--output_path", str(out),
                "--max_frames", str(max_frames),
                "--no_display",
                "--precision", "float32",
            ],
            monkeypatch,
        )
        assert frames_in(out) == want, (max_frames, want)


def test_stylize_image_dir_mode(tmp_path, monkeypatch):
    """--input_dir streams shape-grouped batches (header-probe grouping, one
    decoded batch in memory at a time) through the sharded stylizer."""
    from faststyle_tpu.utils import image_io

    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i, hw in enumerate([(48, 64), (48, 64), (40, 56)]):
        image_io.imwrite(
            d / f"f{i}.png", rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
        )
    out = tmp_path / "out"
    _run(
        "stylize_image",
        [
            "--model_path", str(ROOT / "models/starry_final.npz"),
            "--input_dir", str(d),
            "--output_dir", str(out),
            "--batch_size", "2",
            "--precision", "float32",
        ],
        monkeypatch,
    )
    got = sorted(p.name for p in out.iterdir())
    assert got == ["styled_f0.png", "styled_f1.png", "styled_f2.png"]
    for i, hw in enumerate([(48, 64), (48, 64), (40, 56)]):
        assert image_io.imread(out / f"styled_f{i}.png").shape == (*hw, 3)
