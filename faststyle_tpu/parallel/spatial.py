"""Spatially-partitioned single-image inference over a TPU mesh.

Batch-sharded inference (data_parallel.ShardedStylizer) scales THROUGHPUT;
this module scales LATENCY and memory for one giant frame (4K/8K) by
sharding the image's rows across chips. The reference has no counterpart
(it is single-device, SURVEY.md §2.6); this is the classic TPU spatial-
partitioning recipe, built the shard_map way:

* **overlap-discard windows**: each chip takes its row-slab plus a `halo`
  of rows on each side (the transform net's receptive radius — 9x9 convs,
  two stride-2 stages, 10 VALID 3x3 convs at 1/4 resolution and the
  upsample taps add up to ~54 full-res rows, im_transf_net.py:34-70), runs
  the standard packed forward on the window, and keeps only the rows it
  owns. No activation communication: recompute-in-halo is cheaper than
  ppermute'ing every conv boundary at this model size.
* **collective instance-norm statistics**: IN reduces over the WHOLE image
  (inst_norm, im_transf_net.py:238-239), the one truly global coupling in
  the net. Each shard computes interval-masked (sum, sq-delta) moments
  over only the rows it owns at that layer and `jax.lax.psum`s them over
  the mesh axis — 2 x 16 tiny [C]-vector all-reduces per frame riding ICI.
  Statistics are therefore EXACTLY the single-device ones (up to float
  summation order).
* **phase alignment**: window starts are multiples of 4 so the two
  stride-2 stages and the packed p=4/p=2 grids sample identical phases as
  the single-device run; shard 0 / N-1 windows clamp to the image edges so
  the global reflect padding is computed where it is real.

Exactness (vs the single-device packed forward) requires `H % (4 * n)`
== 0. SpatialStylizer auto-reduces the shard count to the largest aligned
n' (worst case 1 = single device) rather than approximating: reflect-
padding rows to alignment changes the global IN statistics, which measured
as a LARGE output shift (SSIM 0.37 vs the unpadded run on a noise image) —
stylization is globally coupled through its 16 instance norms, so there is
no cheap "approximately sharded" mode worth shipping.

Inference-only: the distributed IN skips the custom-VJP machinery.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from faststyle_tpu.models import transform_net
from faststyle_tpu.ops import layers as L
from faststyle_tpu.ops import packed as PK
from faststyle_tpu.parallel.mesh import DATA_AXIS

# one-sided contamination radius of a window edge in full-res output rows.
# Only the SAME convs inject window-edge wrongness (the VALID resblock convs
# consume rows instead — their receptive field is part of the structural 80-
# row pad budget, not contamination): 9x9 init/final (4+4), stride-2 taps
# and upsample taps (~5) ≈ 13-16 rows. Measured: halo 16 is exact, 12 leaks
# (tests/test_parallel.py); 24 = measured floor + 50% margin, mult of 8.
DEFAULT_HALO = 24


def _in_layer_schedule(h: int) -> List[Tuple[int, int]]:
    """Static (global_extent, offset_divisor) per IN call, in call order.

    offset_divisor maps the window's padded-row start s0 to the layer's row
    space (1 = full resolution, 2 = half, 4 = quarter). Mirrors the layer
    walk of transform_net._apply_packed_one exactly.
    """
    full = h + 80
    half = full // 2
    q0 = full // 4
    sched = [(full, 1), (half, 2), (q0, 4)]
    for i in range(5):  # resblock INs: VALID convs shrink 2 rows each
        sched.append((q0 - (4 * i + 2), 4))
        sched.append((q0 - (4 * i + 4), 4))
    sched.append((2 * (q0 - 20), 2))  # upsample_0
    sched.append((4 * (q0 - 20), 1))  # upsample_1 (== h)
    sched.append((h, 1))  # final 9x9 + IN + tanh
    return sched


def _spatial_instance_norm(
    x_packed: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    p: int,
    own_rows: jax.Array,  # [hp*p] bool, dynamic: rows this shard owns
    lw: int,
    global_count: float,
    axis_name: str,
    eps: float = 1e-3,
) -> jax.Array:
    """Instance norm whose moments are interval-masked locally and psum'd
    over the mesh: bit-equivalent statistics to the single-device masked IN
    (ops/packed.py instance_norm_packed) up to summation order. The
    normalization applies to ALL window positions — halo rows feed later
    convs and need normalized values too."""
    n, hp, wp, cc = x_packed.shape
    c = cc // (p * p)
    xf = x_packed.astype(jnp.float32).reshape(n, hp, wp, p * p, c)
    col = jnp.asarray(
        (np.arange(wp * p) < lw).reshape(wp, p).astype(np.float32)
    )  # static W validity (ragged widths)
    rows = own_rows.astype(jnp.float32).reshape(hp, p)
    # mask [1, hp, wp, p*p, 1] with p*p ordered (dy, dx)
    m = (rows[:, None, :, None] * col[None, :, None, :]).reshape(1, hp, wp, p * p, 1)
    s = lax.psum(jnp.sum(xf * m, axis=(1, 2, 3), keepdims=True), axis_name)
    mean = s / global_count
    v = lax.psum(
        jnp.sum(jnp.square(xf - mean) * m, axis=(1, 2, 3), keepdims=True), axis_name
    )
    var = v / global_count
    out = scale.astype(jnp.float32) * (xf - mean) * lax.rsqrt(var + eps) + shift.astype(
        jnp.float32
    )
    return out.reshape(n, hp, wp, cc).astype(x_packed.dtype)


@dataclass
class _SpatialNorm:
    """Per-IN-call distributed-norm dispatcher threaded through
    _apply_packed_one via its in_norm hook."""

    s0: jax.Array  # this shard's window start in padded rows (mult of 4)
    shard: jax.Array  # axis index
    n_shards: int
    schedule: List[Tuple[int, int]]
    axis_name: str
    calls: int = 0

    def __call__(self, t, scale, shift, p, lh, lw):
        global_lh, div = self.schedule[self.calls]
        self.calls += 1
        offset = self.s0 // div
        # proportional partition of the layer's global rows across shards
        g0 = (self.shard * global_lh) // self.n_shards
        g1 = ((self.shard + 1) * global_lh) // self.n_shards
        hp = t.shape[1]
        gids = offset + jnp.arange(hp * p)
        own = (gids >= g0) & (gids < g1)
        return _spatial_instance_norm(
            t, scale, shift, p, own, lw, float(global_lh * lw), self.axis_name
        )


def spatial_stylize_fn(
    params,
    h: int,
    w: int,
    mesh: Mesh,
    *,
    compute_dtype=None,
    halo: int = DEFAULT_HALO,
    upsample_method: str = "resize",
):
    """Build the jitted spatially-sharded forward for an (h, w) image.

    Returns fn(image[1,h,w,3] or [h,w,3]) -> [h,w,3] float32, with the
    output rows sharded over the mesh (materialize with np.asarray)."""
    if upsample_method not in transform_net.UPSAMPLE_METHODS:
        raise ValueError(f"unknown upsample_method {upsample_method!r}")
    n_shards = int(mesh.devices.size)
    if h % (4 * n_shards) != 0:
        raise ValueError(
            f"spatial sharding needs H % (4*n) == 0 for stride-phase "
            f"alignment; got H={h}, n={n_shards} "
            "(SpatialStylizer auto-selects an aligned shard count)"
        )
    if halo % 4 != 0:
        raise ValueError("halo must be a multiple of 4")
    hs = h // n_shards
    win = hs + 80 + 2 * halo  # window height in padded rows
    hp = h + 80
    if win > hp:
        raise ValueError(
            f"image too small to shard {n_shards} ways with halo {halo}: "
            f"window {win} > padded height {hp}"
        )
    schedule = _in_layer_schedule(h)
    dtype = compute_dtype if compute_dtype is not None else jnp.float32

    def per_shard(padded):  # padded: [1, hp, w+80, 3] replicated
        i = lax.axis_index(DATA_AXIS)
        s0 = jnp.clip(i * hs - halo, 0, hp - win)
        window = lax.dynamic_slice(
            padded, (0, s0, 0, 0), (1, win, padded.shape[2], padded.shape[3])
        )
        pk = transform_net.pack_all_kernels(
            params, win - 80, w, dtype, upsample_method
        )
        in_norm = _SpatialNorm(s0, i, n_shards, schedule, DATA_AXIS)
        out = transform_net._apply_packed_one(
            pk, params, window, dtype, in_norm=in_norm, pre_padded=True,
            up_geom=transform_net._G_UP_DECONV
            if upsample_method == "deconv"
            else transform_net._G_UP,
        )
        assert in_norm.calls == len(schedule), in_norm.calls
        # keep only the owned rows: global [i*hs, (i+1)*hs) -> local start
        own = lax.dynamic_slice(
            out, (0, i * hs - s0, 0, 0), (1, hs, out.shape[2], out.shape[3])
        )
        return own[0]  # [hs, w, 3]; P(DATA_AXIS) concatenates to [h, w, 3]

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=P(),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,
    )

    @jax.jit
    def fn(img):
        if img.ndim == 3:
            img = img[None]
        x = img.astype(dtype)
        padded = L.reflect_pad(x, 40)  # global pad, replicated
        return sharded(padded).astype(jnp.float32)

    return fn


def _single_device(params, compute_dtype, upsample_method, img):
    if img.ndim == 3:
        img = img[None]
    out = transform_net.apply_packed(
        params, img, compute_dtype=compute_dtype, upsample_method=upsample_method
    )
    return out[0].astype(jnp.float32)


class SpatialStylizer:
    """Shape-cached spatially-sharded stylization of single giant frames.

    For each input height, uses the largest shard count n' <= mesh size
    with H % (4*n') == 0 and a big enough window (worst case n' = 1,
    single-device) — every answer is EXACT vs the single-device forward;
    `shards_for(h)` reports the choice. 4K (2160 rows) runs 6-way on an
    8-chip mesh; 8K (4320) runs 8-way."""

    def __init__(
        self,
        params,
        mesh: Mesh,
        *,
        compute_dtype=None,
        halo: int = DEFAULT_HALO,
        upsample_method: str = "resize",
    ):
        if upsample_method not in transform_net.UPSAMPLE_METHODS:
            raise ValueError(f"unknown upsample_method {upsample_method!r}")
        self._params = jax.device_put(
            jax.tree.map(jnp.asarray, params), NamedSharding(mesh, P())
        )
        self._mesh = mesh
        self._dtype = compute_dtype
        self._halo = halo
        self._upsample = upsample_method
        self._fns = {}

    def shards_for(self, h: int) -> int:
        """Largest n <= mesh size with exact alignment and a valid window."""
        for n in range(int(self._mesh.devices.size), 0, -1):
            if h % (4 * n) == 0 and h // n + 2 * self._halo <= h:
                return n
        return 1

    def _fn(self, h: int, w: int):
        if (h, w) not in self._fns:
            n = self.shards_for(h)
            if n == 1:  # misaligned or tiny frame: exact single-device
                self._fns[(h, w)] = jax.jit(
                    functools.partial(
                        _single_device, self._params, self._dtype, self._upsample
                    )
                )
            else:
                mesh = Mesh(self._mesh.devices.reshape(-1)[:n], (DATA_AXIS,))
                self._fns[(h, w)] = spatial_stylize_fn(
                    self._params,
                    h,
                    w,
                    mesh,
                    compute_dtype=self._dtype,
                    halo=self._halo,
                    upsample_method=self._upsample,
                )
        return self._fns[(h, w)]

    def __call__(self, img: np.ndarray) -> np.ndarray:
        """HWC (or 1HWC) RGB [0,255] -> stylized HWC float32 [0,255]."""
        # normalize to float32 BEFORE dispatch: the single-device fallback
        # would otherwise take apply_packed's uint8-in -> uint8-out path
        # (clip+round) while the sharded path returns continuous floats —
        # the same pixel must not depend on whether its frame's height
        # happened to shard
        img = np.asarray(img, np.float32)
        if img.ndim == 4:
            img = img[0]
        return np.asarray(self._fn(img.shape[0], img.shape[1])(jnp.asarray(img)))
