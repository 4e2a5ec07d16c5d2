"""Inference API: model-path resolution, Stylizer behavior, shipped assets."""

from pathlib import Path

import numpy as np
import pytest

from faststyle_tpu.inference import Stylizer, load_params, save_params

ROOT = Path(__file__).parent.parent


def test_reference_style_ckpt_path_resolves_to_npz(tmp_path):
    """The reference's command lines say `models/x_final.ckpt`; when only the
    native .npz exists, load_params must resolve it."""
    params = load_params(ROOT / "weights" / "starry_final.npz")
    save_params(tmp_path / "starry_final.npz", params)
    resolved = load_params(tmp_path / "starry_final.ckpt")
    np.testing.assert_array_equal(
        resolved["initconv_0"]["W"], params["initconv_0"]["W"]
    )


def test_missing_model_raises():
    with pytest.raises(FileNotFoundError):
        load_params("/nonexistent/model")


def test_shipped_assets_present():
    """Reference-parity asset layout: models/, style_images/, weights/."""
    for rel in [
        "models/starry_final.npz",
        "models/candy_final.npz",
        "weights/starry_final.npz",
        "style_images/starry_night_crop.jpg",
        "style_images/candy.jpg",
        "scripts/get_vgg16_weights.sh",
    ]:
        assert (ROOT / rel).exists(), rel


def test_stylizer_uint8_roundtrip(chicago_crop256):
    s = Stylizer(ROOT / "models" / "starry_final.npz")
    out = s(chicago_crop256)
    assert out.dtype == np.uint8
    assert out.shape == chicago_crop256.shape


def test_save_load_roundtrip(tmp_path, starry_params):
    save_params(tmp_path / "m.npz", starry_params)
    back = load_params(tmp_path / "m.npz")
    for blk in starry_params:
        for var in starry_params[blk]:
            np.testing.assert_array_equal(back[blk][var], np.asarray(starry_params[blk][var]))


def test_profiling_helpers_smoke():
    import jax.numpy as jnp

    from faststyle_tpu.utils import profiling

    profiling.hard_sync(jnp.ones((4, 4)))
    t = profiling.StepTimer()
    t.start()
    t.step()
    assert t.rate() > 0


def test_unpack_u8_host_native_matches_numpy(monkeypatch):
    """Native depth-to-space == numpy reference, aligned and ragged."""
    from faststyle_tpu import native
    from faststyle_tpu.inference import unpack_u8_host

    rng = np.random.default_rng(0)
    for h, w in ((64, 96), (59, 83), (61, 128)):
        hb, wb = -(-h // 4), -(-w // 4)
        packed = rng.integers(0, 256, (2, hb, wb, 48), dtype=np.uint8)
        got = unpack_u8_host(packed, h, w)
        monkeypatch.setattr(native, "load", lambda: None)
        want = unpack_u8_host(packed, h, w)
        monkeypatch.undo()
        assert got.shape == (2, h, w, 3)
        np.testing.assert_array_equal(got, want)


def test_stylizer_packed_output_matches_plain(chicago_crop256):
    from faststyle_tpu.inference import unpack_u8_host

    plain = Stylizer(ROOT / "models" / "starry_final.npz", output_uint8=True)
    packed = Stylizer(ROOT / "models" / "starry_final.npz", packed_output=True)
    img = chicago_crop256.astype(np.uint8)
    want = np.asarray(plain.stylize_batch(img[None]))
    raw = np.asarray(packed.stylize_batch(img[None]))
    assert raw.shape == (1, 64, 64, 48)
    got = unpack_u8_host(raw, 256, 256)
    np.testing.assert_array_equal(got, want)
    # __call__ convenience path unpacks internally
    np.testing.assert_array_equal(packed(img), want[0])


def test_stylizer_packed_output_ragged_size(chicago_crop256):
    """Ragged H/W: the packed-u8 output carries zero tails; the host unpack
    crops them exactly."""
    from faststyle_tpu.inference import unpack_u8_host

    from faststyle_tpu.models import transform_net

    img = chicago_crop256[:250, :243].astype(np.uint8)
    plain = Stylizer(ROOT / "models" / "starry_final.npz", output_uint8=True)
    packed = Stylizer(ROOT / "models" / "starry_final.npz", packed_output=True)
    want = np.asarray(plain.stylize_batch(img[None]))
    raw = np.asarray(packed.stylize_batch(img[None]))
    oh, ow = transform_net.output_shape(250, 243)
    assert (oh, ow) == want.shape[1:3] == (252, 244)  # the net's shape law
    assert raw.shape == (1, 63, 61, 48)  # ceil(252/4), ceil(244/4)
    got = unpack_u8_host(raw, oh, ow)
    np.testing.assert_array_equal(got, want)
    # __call__ uses the law internally
    np.testing.assert_array_equal(packed(img), want[0])


def test_stylizer_packed_input_matches_plain(chicago_crop256):
    """Host-side pack (native reflect-pad + space-to-depth) feeding the
    device's packed entry == the plain uint8 path, bit-exact."""
    img = chicago_crop256.astype(np.uint8)[None]
    plain = Stylizer(ROOT / "models" / "starry_final.npz", output_uint8=True)
    pio = Stylizer(ROOT / "models" / "starry_final.npz", packed_input=True)
    want = np.asarray(plain.stylize_batch(img))
    got = np.asarray(pio.stylize_batch(img))
    np.testing.assert_array_equal(got, want)
    # full packed I/O through the convenience API, ragged size
    pio2 = Stylizer(
        ROOT / "models" / "starry_final.npz", packed_input=True, packed_output=True
    )
    ragged = img[0, :250, :243]
    want2 = plain(ragged)
    np.testing.assert_array_equal(pio2(ragged), want2)


def test_packed_input_float_frames_warn_once(starry_params):
    """packed_input quantizes float frames to uint8 — that precision loss
    must be VISIBLE (one warning per stylizer, review r4 weak #6), must not
    fire for uint8 frames, and the quantized result must equal feeding the
    same frames pre-quantized."""
    import warnings

    rng = np.random.default_rng(0)
    fimg = rng.uniform(0, 255, (1, 48, 44, 3)).astype(np.float32)
    s = Stylizer(params=starry_params, packed_input=True, packed_output=True)
    with pytest.warns(UserWarning, match="quantizing to uint8"):
        got = np.asarray(s.stylize_batch(fimg))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning now fails the test
        again = np.asarray(s.stylize_batch(fimg))  # once per instance only
        u8 = np.asarray(
            s.stylize_batch(np.clip(fimg, 0, 255).astype(np.uint8))
        )  # uint8 frames never warn
    np.testing.assert_array_equal(got, again)
    np.testing.assert_array_equal(got, u8)
    # a fresh instance warns again (per-instance, not per-process)
    s2 = Stylizer(params=starry_params, packed_input=True, packed_output=True)
    with pytest.warns(UserWarning, match="quantizing to uint8"):
        s2.stylize_batch(fimg)


def test_pack_u8_host_native_matches_numpy(monkeypatch):
    from faststyle_tpu import native
    from faststyle_tpu.inference import pack_u8_host

    rng = np.random.default_rng(0)
    for h, w in ((64, 96), (59, 83), (41, 41)):
        x = rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)
        got = pack_u8_host(x)
        monkeypatch.setattr(native, "load", lambda: None)
        want = pack_u8_host(x)
        monkeypatch.undo()
        np.testing.assert_array_equal(got, want)


def test_host_relayout_slab_parallel_exact(monkeypatch):
    """Row-slab parallel pack/unpack (big frames split across the host pool)
    is bit-identical to single-slab: disjoint block-row ranges, including the
    ragged-tail memset and the dy==3 overhang guard, never interact."""
    import faststyle_tpu.inference as inf
    from faststyle_tpu import native

    if native.load() is None:  # pragma: no cover
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(1)
    # force multi-slab even on a 1-core sandbox and at small sizes
    monkeypatch.setattr(inf, "_HOST_WORKERS", 4)
    monkeypatch.setattr(inf, "_MIN_ROWS_PER_SLAB", 8)
    for h, w in ((256, 384), (250, 243)):
        x = rng.integers(0, 256, (1, h, w, 3), dtype=np.uint8)
        packed_par = inf.pack_u8_host(x)
        hb, wb = -(-h // 4), -(-w // 4)
        raw = rng.integers(0, 256, (1, hb, wb, 48), dtype=np.uint8)
        unpacked_par = inf.unpack_u8_host(raw, h, w)
        monkeypatch.setattr(inf, "_HOST_WORKERS", 1)
        np.testing.assert_array_equal(packed_par, inf.pack_u8_host(x))
        np.testing.assert_array_equal(unpacked_par, inf.unpack_u8_host(raw, h, w))
        monkeypatch.setattr(inf, "_HOST_WORKERS", 4)


def test_warmup_compiles_every_signature(chicago_crop256):
    """warmup() must pre-compile BOTH dtype signatures stylize_batch can hit
    under output_uint8 (uint8 streaming frames AND float32 preprocessed
    video) — a missed signature bills a cold compile to the first real
    frame (minutes on tunneled runtimes)."""
    s = Stylizer(ROOT / "models" / "starry_final.npz", output_uint8=True)
    h, w = 64, 48
    s.warmup(h, w)
    n_sigs = s._fn._cache_size()
    assert n_sigs == 2
    # neither real-traffic dtype triggers a new trace now
    s.stylize_batch(np.zeros((1, h, w, 3), np.uint8))
    s.stylize_batch(np.zeros((1, h, w, 3), np.float32))
    assert s._fn._cache_size() == n_sigs


@pytest.mark.slow  # 15 s; resize-path packed I/O equality stays in the fast lane
def test_stylizer_packed_io_deconv_matches_plain(chicago_crop256):
    """Packed-u8 I/O serving now covers 'deconv' models too (the packed walk
    packs the sub-pixel phase decomposition) — equality vs the plain deconv
    path, including a ragged size."""
    from faststyle_tpu.inference import unpack_u8_host

    net = ROOT / "tests" / "assets" / "deconv_oracle_net.npz"
    img = chicago_crop256.astype(np.uint8)
    plain = Stylizer(net, upsample_method="deconv", output_uint8=True)
    pio = Stylizer(
        net, upsample_method="deconv", packed_input=True, packed_output=True
    )
    want = np.asarray(plain.stylize_batch(img[None]))
    raw = np.asarray(pio.stylize_batch(img[None]))
    got = unpack_u8_host(raw, 256, 256)
    np.testing.assert_array_equal(got, want)
    ragged = img[:250, :243]
    np.testing.assert_array_equal(pio(ragged), plain(ragged))
