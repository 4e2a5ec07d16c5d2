"""High-level stylization inference API.

Replaces the reference's per-image graph rebuild + Session.run flow
(`/root/reference/stylize_image.py:46-82`) with a shape-cached jitted forward
function: first call per input shape compiles, subsequent calls reuse the
executable. Covers both single-image and streaming (webcam) use — the
reference's separate fixed-shape webcam graph (stylize_webcam.py:63-66) is
just the shape-cache behavior here.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from faststyle_tpu.models import transform_net


def load_params(model_path: str | Path) -> Dict:
    """Load transform-net params from any supported container:

    * TF1 V2 checkpoint prefix (`<p>.index` + `<p>.data-*` exist) — the
      reference's shipped format, parsed without TF by compat.tf1_checkpoint;
    * `.npz` — this framework's native flat container ('block/var' keys).
    """
    model_path = Path(model_path)
    if model_path.with_name(model_path.name + ".index").exists():
        from faststyle_tpu.compat import tf1_checkpoint

        return tf1_checkpoint.load_transform_net_params(model_path)
    # reference-style command lines name `models/<x>_final.ckpt`; resolve to
    # the native container when the TF files aren't present
    candidates = [model_path]
    if model_path.suffix == ".ckpt":
        candidates.append(model_path.with_suffix(".npz"))
    elif model_path.suffix != ".npz":
        candidates.append(model_path.with_name(model_path.name + ".npz"))
    for cand in candidates:
        if cand.suffix == ".npz" and cand.exists():
            flat = np.load(cand)
            params: Dict[str, Dict[str, np.ndarray]] = {}
            for key in flat.files:
                blk, var = key.split("/")
                params.setdefault(blk, {})[var] = flat[key]
            return params
    raise FileNotFoundError(f"no model found at {model_path} (.index / .npz)")


def save_params(model_path: str | Path, params: Dict) -> None:
    """Save params as the native flat `.npz` container."""
    flat = {f"{blk}/{var}": np.asarray(arr) for blk, sub in params.items() for var, arr in sub.items()}
    np.savez(model_path, **flat)


class Stylizer:
    """Shape-cached jitted stylization of RGB [0,255] images.

    `compute_dtype=jnp.bfloat16` runs the conv stack in bf16 (MXU-native,
    halves HBM traffic); instance-norm statistics stay in float32. Default is
    float32 — the parity-test precision.
    """

    def __init__(
        self,
        model_path: str | Path | None = None,
        params: Optional[Dict] = None,
        upsample_method: str = "resize",
        compute_dtype=None,
        output_uint8: bool = False,
    ):
        """`output_uint8` clips and casts ON DEVICE — inside the packed
        forward, BEFORE the output relayout, so the C=3 boundary copies move
        1-byte elements (docs/PERF.md) — and fetching a stylized frame moves
        1/4 the bytes of float32; the fetch is the serving bottleneck for
        streaming (especially over remote attachments). uint8 *input* frames
        (what cameras/decoders produce) are likewise packed in uint8 and
        cast on device."""
        if params is None:
            if model_path is None:
                raise ValueError("need model_path or params")
            params = load_params(model_path)
        self._params = jax.device_put(
            jax.tree.map(jnp.asarray, params)
        )
        self._method = upsample_method
        self._output_uint8 = output_uint8

        def fwd(p, x):
            return transform_net.apply(
                p,
                x,
                upsample_method=upsample_method,
                compute_dtype=compute_dtype,
                output_dtype=jnp.uint8 if output_uint8 else None,
            )

        self._fn = jax.jit(fwd)

    @property
    def params(self) -> Dict:
        return self._params

    def stylize_batch(self, imgs: jax.Array | np.ndarray) -> jax.Array:
        """NHWC RGB [0,255] -> stylized NHWC [0,255] (device array; float32,
        or uint8 with output_uint8=True). With output_uint8, uint8 inputs are
        fed to the device as-is (4x smaller transfer + 1-byte input relayout);
        otherwise inputs are cast to float32 to keep the output contract."""
        imgs = jnp.asarray(imgs)
        if not (self._output_uint8 and imgs.dtype == jnp.uint8):
            imgs = imgs.astype(jnp.float32)
        return self._fn(self._params, imgs)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        """Single HWC image (uint8 or float RGB) -> stylized HWC uint8."""
        img = np.asarray(img)
        if not (self._output_uint8 and img.dtype == np.uint8):
            img = img.astype(np.float32)
        out = self.stylize_batch(img[None])
        out = np.asarray(out[0])
        if out.dtype == np.uint8:
            return out
        return np.clip(out, 0, 255).astype(np.uint8)

    def warmup(self, height: int, width: int) -> None:
        """Pre-compile for a given input shape (streaming cold-start control).
        Warms the dtype signature the serving loop will hit: uint8 frames
        when output_uint8 (the streaming contract), else float32."""
        dt = np.uint8 if self._output_uint8 else np.float32
        out = self.stylize_batch(np.zeros((1, height, width, 3), dt))
        # hard sync via a value fetch: on tunneled runtimes (axon)
        # block_until_ready can return while compile+execute are still in
        # flight, which would bill the whole compile to the first real frame
        np.asarray(out[:, 0, 0, 0])
