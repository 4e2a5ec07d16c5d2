"""Packaging/installed-tree behaviors (round-4 advisor fixes).

- native cache-dir fallback build: a pip-installed (read-only site-packages)
  tree must still get the C++ acceleration — sources + Makefile ship as
  package data and build into $XDG_CACHE_HOME (faststyle_tpu/native/__init__.py).
- the `tensorboard` extra installs tensorboardX, so MetricsLogger must
  actually probe tensorboardX (it used to import only torch's writer).
"""

import ctypes
import sys
import types
from pathlib import Path

import numpy as np

from faststyle_tpu import native


def test_native_cache_build(tmp_path, monkeypatch):
    """_cache_build compiles the shipped sources into XDG_CACHE_HOME and the
    resulting .so exposes the expected symbols (what load() falls back to
    when the package dir is unwritable)."""
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    so = native._cache_build()
    assert so.exists() and str(so).startswith(str(tmp_path))
    lib = ctypes.CDLL(str(so))
    for sym in ("fs_masked_crc32c", "fs_unpack_u8", "fs_pack_u8"):
        assert hasattr(lib, sym)
    # keyed by source hash: a second call reuses the same artifact
    assert native._cache_build() == so
    # the built codec actually runs: CRC of b"" must match the shipped lib's
    lib.fs_masked_crc32c.restype = ctypes.c_uint32
    lib.fs_masked_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    shipped = native.load()
    if shipped is not None:
        assert lib.fs_masked_crc32c(b"x", 1) == shipped.fs_masked_crc32c(b"x", 1)
    # no private .build-<pid> work dirs left behind (review r4: concurrent
    # first-use processes compile privately, then atomically publish the .so)
    assert not list(so.parent.parent.glob("*.build-*"))


def test_native_cache_build_empty_xdg(tmp_path, monkeypatch):
    """XDG spec: an EMPTY XDG_CACHE_HOME must be treated as unset — the build
    must land under ~/.cache, never the process CWD (review r4). HOME is
    pointed at tmp_path so the fallback branch is exercised WITHOUT compiling
    into the user's real ~/.cache (review r5: the test must stay hermetic and
    pass on read-only-HOME CI)."""
    monkeypatch.setenv("XDG_CACHE_HOME", "")
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.chdir(tmp_path)
    so = native._cache_build()
    assert so.exists()
    assert str(so).startswith(str(tmp_path / ".cache"))
    # nothing scattered into CWD outside the ~/.cache subtree
    assert all(".cache" in str(p) for p in tmp_path.rglob("*.so"))


def test_metrics_logger_uses_tensorboardx(tmp_path, monkeypatch):
    """Installing the `tensorboard` extra (tensorboardX) enables event
    writing — logging.py probes tensorboardX before torch's writer."""
    from faststyle_tpu.utils.logging import MetricsLogger

    calls = []

    class FakeWriter:
        def __init__(self, log_dir=None):
            calls.append(("init", log_dir))

        def add_scalar(self, key, val, step):
            calls.append((key, float(val), step))

        def close(self):
            calls.append(("close",))

    fake = types.ModuleType("tensorboardX")
    fake.SummaryWriter = FakeWriter
    monkeypatch.setitem(sys.modules, "tensorboardX", fake)

    logger = MetricsLogger(tmp_path, "run0", echo=False, tensorboard=True)
    logger.log(1, {"loss": np.float32(2.5)})
    logger.close()
    assert calls[0][0] == "init"
    assert ("loss", 2.5, 1) in calls
    assert calls[-1] == ("close",)
