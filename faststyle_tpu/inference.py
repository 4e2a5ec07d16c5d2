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
import os
import threading
import warnings
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from faststyle_tpu.models import transform_net

# Worker pool for host-side pack/unpack: the native kernels release the GIL
# (ctypes) and are independent per packed block-row, so a single 4K frame
# splits into row slabs across cores (single-threaded 4K unpack is 44 ms vs
# 28 ms device time — host-bound without this; docs/PERF.md). Lazy so mere
# import costs nothing.
_host_pool: Optional[ThreadPoolExecutor] = None
_host_pool_lock = threading.Lock()
_HOST_WORKERS = min(8, os.cpu_count() or 1)
# below this many packed block-rows the dispatch overhead beats the win
_MIN_ROWS_PER_SLAB = 64


def _pool() -> ThreadPoolExecutor:
    global _host_pool
    if _host_pool is None:
        with _host_pool_lock:  # threaded serving hosts race the first call
            if _host_pool is None:
                _host_pool = ThreadPoolExecutor(
                    max_workers=_HOST_WORKERS, thread_name_prefix="fs-host-relayout"
                )
    return _host_pool


def _parallel_rows(fn, hb: int) -> None:
    """Run fn(by0, by1) over [0, hb) — sliced across the pool when large."""
    slabs = min(_HOST_WORKERS, max(1, hb // _MIN_ROWS_PER_SLAB))
    if slabs == 1:
        fn(0, hb)
        return
    bounds = [hb * i // slabs for i in range(slabs + 1)]
    futs = [_pool().submit(fn, bounds[i], bounds[i + 1]) for i in range(slabs)]
    for f in futs:
        f.result()


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


def unpack_u8_host(packed: np.ndarray, height: int, width: int, p: int = 4, c: int = 3) -> np.ndarray:
    """Host-side depth-to-space for `output_layout='packed_u8'` stylizer
    output: [N, Hb, Wb, p*p*c] uint8 -> [N, height, width, c] uint8.

    Uses the native C++ kernel (native/depth_to_space.cc) when available —
    ctypes releases the GIL, so batched frames can unpack on worker threads
    while the device computes the next frame — with a pure-numpy fallback.
    """
    packed = np.ascontiguousarray(packed)
    if packed.dtype != np.uint8 or packed.ndim != 4:
        raise ValueError(f"expected uint8 NHWC packed array, got {packed.dtype} ndim={packed.ndim}")
    n, hb, wb, cc = packed.shape
    # explicit raises, not asserts: these precondition the raw-pointer native
    # kernel below — stripped under python -O they'd become OOB writes
    if cc != p * p * c or height > hb * p or width > wb * p:
        raise ValueError(
            f"packed shape {packed.shape} inconsistent with p={p}, c={c}, "
            f"target {height}x{width}"
        )
    from faststyle_tpu import native

    lib = native.load()
    if lib is not None:
        out = np.empty((n, height, width, c), np.uint8)
        if hasattr(lib, "fs_unpack_u8_rows"):
            for i in range(n):
                src, dst = packed[i].ctypes.data, out[i].ctypes.data
                _parallel_rows(
                    lambda by0, by1, src=src, dst=dst: lib.fs_unpack_u8_rows(
                        src, dst, hb, wb, p, c, height, width, by0, by1
                    ),
                    hb,
                )
        elif hasattr(lib, "fs_unpack_u8"):
            # stale prebuilt .so without the row-range entry point
            for i in range(n):
                lib.fs_unpack_u8(
                    packed[i].ctypes.data, out[i].ctypes.data, hb, wb, p, c, height, width
                )
        else:
            # .so predates depth_to_space.cc entirely (codec symbols only,
            # no compiler to rebuild): numpy fallback below
            lib = None
    if lib is not None:
        return out
    full = (
        packed.reshape(n, hb, wb, p, p, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, hb * p, wb * p, c)
    )
    return np.ascontiguousarray(full[:, :height, :width, :])


def pack_u8_host(imgs: np.ndarray, pad: int = 40, p: int = 4) -> np.ndarray:
    """Host-side reflect-pad + space-to-depth pack of uint8 RGB frames:
    [N, H, W, 3] -> [N, ceil((H+2*pad)/p), ceil((W+2*pad)/p), p*p*3].

    The input-side twin of unpack_u8_host: with `packed_input` serving, the
    device receives frames already in the packed layout and skips the input
    boundary relayout (docs/PERF.md). Native C++ kernel (GIL released) with
    a pure-numpy fallback."""
    imgs = np.ascontiguousarray(imgs)
    # explicit raise (python -O strips asserts; this guards a raw-pointer kernel)
    if imgs.dtype != np.uint8 or imgs.ndim != 4 or imgs.shape[-1] != 3:
        raise ValueError(
            f"pack_u8_host needs uint8 NHWC RGB frames, got {imgs.dtype} "
            f"shape {imgs.shape}"
        )
    n, h, w, _ = imgs.shape
    if h <= pad or w <= pad:
        raise ValueError(
            f"packed input needs frames larger than the {pad}px reflect pad "
            f"(got {h}x{w}): single-reflection padding is undefined below "
            f"pad+1 px. Use a Stylizer without packed_input for tiny frames "
            f"(the plain path multi-reflects)."
        )
    hp, wp = h + 2 * pad, w + 2 * pad
    hb, wb = -(-hp // p), -(-wp // p)
    from faststyle_tpu import native

    lib = native.load()
    if lib is not None and hasattr(lib, "fs_pack_u8") and p == 4:
        out = np.empty((n, hb, wb, p * p * 3), np.uint8)
        if hasattr(lib, "fs_pack_u8_rows"):
            for i in range(n):
                src, dst = imgs[i].ctypes.data, out[i].ctypes.data
                _parallel_rows(
                    lambda by0, by1, src=src, dst=dst: lib.fs_pack_u8_rows(
                        src, dst, h, w, pad, by0, by1
                    ),
                    hb,
                )
        else:
            for i in range(n):
                lib.fs_pack_u8(imgs[i].ctypes.data, out[i].ctypes.data, h, w, pad)
        return out
    padded = np.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    full = np.zeros((n, hb * p, wb * p, 3), np.uint8)
    full[:, :hp, :wp] = padded
    return np.ascontiguousarray(
        full.reshape(n, hb, p, wb, p, 3)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, hb, wb, p * p * 3)
    )


def quantize_for_packed_input(imgs: np.ndarray, owner) -> np.ndarray:
    """Clip + quantize float frames to uint8 for the packed host pack stage.

    The packed_input path serves the camera/decoder contract (uint8 frames);
    a float frame fed to it loses its fractional intensities. That used to
    happen silently (documented only in a comment — review r4 weak #6); now
    it warns ONCE per stylizer instance so the contract is visible where it
    bites. `owner` is any object with a `_warned_quantize` attribute
    (Stylizer / ShardedStylizer). uint8 frames pass through untouched."""
    if imgs.dtype == np.uint8:
        return imgs
    if not owner._warned_quantize:
        owner._warned_quantize = True
        warnings.warn(
            "packed_input stylizer received float frames: quantizing to uint8 "
            "(fractional intensities are lost). Use a Stylizer without "
            "packed_input to preserve float input precision.",
            stacklevel=3,
        )
    return np.clip(imgs, 0, 255).astype(np.uint8)


def make_forward(
    upsample_method: str,
    compute_dtype,
    *,
    output_uint8: bool,
    packed_input: bool,
    packed_output: bool,
):
    """The ONE serving forward contract, shared by the single-chip Stylizer
    and parallel.data_parallel.ShardedStylizer (review r4: the dispatch lived
    in two drifting copies). Returns fwd(params, x, hw=None): packed flags
    route through transform_net.apply_packed with uint8/packed-u8 layouts;
    otherwise plain apply with optional on-device uint8 output."""

    def fwd(p, x, hw=None):
        if packed_input or packed_output:
            return transform_net.apply_packed(
                p,
                x,
                compute_dtype=compute_dtype,
                output_dtype=jnp.uint8,
                output_layout="packed_u8" if packed_output else "nhwc",
                input_layout="packed_u8" if packed_input else "nhwc",
                input_hw=hw,
                upsample_method=upsample_method,
            )
        return transform_net.apply(
            p,
            x,
            upsample_method=upsample_method,
            compute_dtype=compute_dtype,
            output_dtype=jnp.uint8 if output_uint8 else None,
        )

    return fwd


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
        packed_output: bool = False,
        packed_input: bool = False,
    ):
        """`output_uint8` clips and casts ON DEVICE — inside the packed
        forward, BEFORE the output relayout, so the C=3 boundary copies move
        1-byte elements (docs/PERF.md) — and fetching a stylized frame moves
        1/4 the bytes of float32; the fetch is the serving bottleneck for
        streaming (especially over remote attachments). uint8 *input* frames
        (what cameras/decoders produce) are likewise packed in uint8 and
        cast on device.

        `packed_output` (implies output_uint8) additionally skips the
        device-side output relayout: stylize_batch returns the packed uint8
        tensor [N, ceil(OH/4), ceil(OW/4), 48] where (OH, OW) =
        transform_net.output_shape(H, W) (== (H, W) for mult-of-4 sizes);
        convert with `unpack_u8_host(out, OH, OW)` (native C++
        depth-to-space), overlapping host interleave with the next frame's
        device compute.

        `packed_input` is the symmetric input-side fast path: stylize_batch
        takes uint8 NHWC frames, reflect-pads + packs them on the HOST
        (pack_u8_host, native C++), and the device skips the input boundary
        relayout too. With both packed flags the device runs pure packed
        compute — its fastest serving configuration (docs/PERF.md)."""
        if params is None:
            if model_path is None:
                raise ValueError("need model_path or params")
            params = load_params(model_path)
        self._params = jax.device_put(
            jax.tree.map(jnp.asarray, params)
        )
        self._method = upsample_method
        self._output_uint8 = output_uint8 or packed_output or packed_input
        self._packed_output = packed_output
        self._packed_input = packed_input
        self._warned_quantize = False
        if (packed_output or packed_input) and upsample_method not in (
            transform_net.UPSAMPLE_METHODS
        ):
            raise ValueError(f"unknown upsample_method {upsample_method!r}")
        output_uint8 = self._output_uint8

        fwd = make_forward(
            upsample_method,
            compute_dtype,
            output_uint8=output_uint8,
            packed_input=packed_input,
            packed_output=packed_output,
        )

        if packed_input:
            # (h, w) is a static arg the packed shape can't disambiguate:
            # one jitted fn per logical size (shape-cached like everything)
            self._fns = {}

            def packed_call(x_packed, hw):
                if hw not in self._fns:
                    self._fns[hw] = jax.jit(functools.partial(fwd, hw=hw))
                return self._fns[hw](self._params, x_packed)

            self._packed_call = packed_call
        self._fn = jax.jit(fwd)

    @property
    def params(self) -> Dict:
        return self._params

    def stylize_batch(self, imgs: jax.Array | np.ndarray) -> jax.Array:
        """NHWC RGB [0,255] -> stylized NHWC [0,255] (device array; float32,
        or uint8 with output_uint8=True). With output_uint8, uint8 inputs are
        fed to the device as-is (4x smaller transfer + 1-byte input relayout);
        otherwise inputs are cast to float32 to keep the output contract.

        With packed_input=True the host pack stage is uint8-only: float
        frames are clipped to [0,255] and QUANTIZED to uint8 before packing
        (fractional intensities are lost — the camera/decoder contract this
        path serves is uint8 anyway; a one-time warning fires when it
        happens). Use a non-packed Stylizer to preserve float precision."""
        if self._packed_input:
            imgs = quantize_for_packed_input(np.asarray(imgs), self)
            packed = pack_u8_host(imgs)
            return self._packed_call(packed, imgs.shape[1:3])
        dt = getattr(imgs, "dtype", None)
        if dt != jnp.float32 and not (self._output_uint8 and dt == jnp.uint8):
            # single conversion; already-f32 (or servable-u8) arrays pass
            # through untouched — per-call host overhead is visible at
            # small-frame rates (~760 vs 890 fps at 512px on a slow host)
            imgs = jnp.asarray(imgs, jnp.float32)
        return self._fn(self._params, imgs)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        """Single HWC image (uint8 or float RGB) -> stylized HWC uint8."""
        img = np.asarray(img)
        if not (self._output_uint8 and img.dtype == np.uint8):
            img = img.astype(np.float32)
        out = self.stylize_batch(img[None])
        if self._packed_output:
            oh, ow = transform_net.output_shape(img.shape[0], img.shape[1])
            return unpack_u8_host(np.asarray(out), oh, ow)[0]
        out = np.asarray(out[0])
        if out.dtype == np.uint8:
            return out
        return np.clip(out, 0, 255).astype(np.uint8)

    def warmup(self, height: int, width: int, dtypes=None) -> None:
        """Pre-compile for a given input shape (streaming cold-start control).

        By default warms EVERY dtype signature stylize_batch can hit at this
        shape: uint8 when output_uint8 (the streaming contract) AND float32
        (video pipelines that preprocess in float) — a cold cache compiles
        for minutes per signature on tunneled runtimes, so missing one would
        bill it to the first real frame. A caller that KNOWS its traffic is
        single-dtype passes `dtypes=[np.uint8]` (or float32) to pay only one
        compile. The packed_input path quantizes to uint8 on host, so it has
        a single device signature regardless."""
        if dtypes is None:
            if self._output_uint8:
                dtypes = [np.uint8, np.float32]
            else:
                dtypes = [np.float32]
        if self._packed_input:
            dtypes = [np.uint8]
        for dt in dtypes:
            out = self.stylize_batch(np.zeros((1, height, width, 3), dt))
            # hard sync via a value fetch: on tunneled runtimes (axon)
            # block_until_ready can return while compile+execute are still in
            # flight, which would bill the whole compile to the first real frame
            np.asarray(out[:, 0, 0, 0])
