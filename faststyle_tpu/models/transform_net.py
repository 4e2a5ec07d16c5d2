"""Johnson-style image transformation network (instance-norm variant).

TPU-native re-implementation of the reference architecture
(`/root/reference/im_transf_net.py:14-75`): a pure function of a params pytree,
jit/pjit-friendly (static shapes, no Python data-dependence), NHWC layout.

Exact topology (parity-critical, see SURVEY.md §2.3):
  reflect_pad 40
  initconv_0: 9x9  3->16 s1 SAME  | IN | relu
  initconv_1: 3x3 16->32 s2 SAME  | IN | relu
  initconv_2: 3x3 32->64 s2 SAME  | IN | relu
  resblock_0..4: [3x3 64->64 VALID | IN | relu | 3x3 VALID | IN] + crop-2 skip
  upsample_0: resize-conv (or deconv) 3x3 64->32 net-2x | IN | relu
  upsample_1: resize-conv (or deconv) 3x3 32->16 net-2x | IN | relu
  upsample_2: 9x9 16->3 s1 SAME | IN | scaled_tanh  -> [0, 255]

Input contract: NHWC float, raw RGB in [0,255], any H and W. Output range
[0,255]; output spatial size equals the input for H,W divisible by 4, and
follows the reference's shape law 4*ceil(ceil((d+80)/2)/2) - 80 otherwise
(e.g. 474 -> 476, matching TF1's SAME/ceil arithmetic — see test_shape_law).

Params pytree layout intentionally mirrors the TF1 checkpoint variable names
(`img_t_net/<block>/<var>`, see compat.tf1_checkpoint) as a nested dict:
  params['initconv_0'] = {'W','INscale','INshift'}
  params['resblock_k'] = {'W1','INscale1','INshift1','W2','INscale2','INshift2'}
  params['upsample_k'] = {'W','INscale','INshift'}
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from faststyle_tpu.ops import layers as L
from faststyle_tpu.ops import packed as PK

Params = Dict[str, Dict[str, Any]]

# (kernel, cin, cout, stride) per block — the instance-norm "halved" widths
_INIT_SPECS = [(9, 3, 16, 1), (3, 16, 32, 2), (3, 32, 64, 2)]
_NUM_RESBLOCKS = 5
_UP_SPECS = [(3, 64, 32), (3, 32, 16)]
_FINAL_SPEC = (9, 16, 3)

UPSAMPLE_METHODS = ("resize", "deconv")


def init_params(rng: jax.Array, upsample_method: str = "resize") -> Params:
    """Fresh training init matching the reference's distributions:

    conv W ~ N(0, 0.1^2) (im_transf_net.py:110-114); the upsample convs use
    TF's random_normal default stddev=1.0 (im_transf_net.py:146-149,180-183) —
    a reference quirk preserved because it defines the published recipe.
    IN scale=1, shift=0 (im_transf_net.py:233-236). No biases anywhere.
    """
    assert upsample_method in UPSAMPLE_METHODS
    params: Params = {}
    keys = iter(jax.random.split(rng, 32))

    def norm(k, shape, stddev):
        return stddev * jax.random.normal(k, shape, dtype=jnp.float32)

    for i, (k, cin, cout, _s) in enumerate(_INIT_SPECS):
        params[f"initconv_{i}"] = {
            "W": norm(next(keys), (k, k, cin, cout), 0.1),
            "INscale": jnp.ones((cout,), jnp.float32),
            "INshift": jnp.zeros((cout,), jnp.float32),
        }
    for i in range(_NUM_RESBLOCKS):
        params[f"resblock_{i}"] = {
            "W1": norm(next(keys), (3, 3, 64, 64), 0.1),
            "INscale1": jnp.ones((64,), jnp.float32),
            "INshift1": jnp.zeros((64,), jnp.float32),
            "W2": norm(next(keys), (3, 3, 64, 64), 0.1),
            "INscale2": jnp.ones((64,), jnp.float32),
            "INshift2": jnp.zeros((64,), jnp.float32),
        }
    for i, (k, cin, cout) in enumerate(_UP_SPECS):
        wshape = (k, k, cout, cin) if upsample_method == "deconv" else (k, k, cin, cout)
        params[f"upsample_{i}"] = {
            "W": norm(next(keys), wshape, 1.0),
            "INscale": jnp.ones((cout,), jnp.float32),
            "INshift": jnp.zeros((cout,), jnp.float32),
        }
    k, cin, cout = _FINAL_SPEC
    wshape = (k, k, cout, cin) if upsample_method == "deconv" else (k, k, cin, cout)
    params["upsample_2"] = {
        "W": norm(next(keys), wshape, 1.0 if upsample_method == "deconv" else 0.1),
        "INscale": jnp.ones((cout,), jnp.float32),
        "INshift": jnp.zeros((cout,), jnp.float32),
    }
    return params


def output_shape(h: int, w: int) -> tuple[int, int]:
    """The net's spatial shape law (matches the reference's resize-upsample
    rounding, im_transf_net.py:56-70): H -> 4*ceil(ceil((H+80)/2)/2) - 80.
    Equal to (h, w) whenever both divide 4; up to 3 px larger otherwise.
    Callers of output_layout='packed_u8' need this extent for
    inference.unpack_u8_host."""

    def law(x: int) -> int:
        half = -(-(x + 80) // 2)
        quarter = -(-half // 2)
        return 4 * (quarter - 20)

    return law(h), law(w)


def packed_layout_supported(h: int, w: int, upsample_method: str = "resize") -> bool:
    """The packed fast path covers BOTH upsample variants at ANY input size
    (ragged packings carry zeroed tails + masked statistics — see
    apply_packed). The deconv upsamples ride the same machinery through
    their sub-pixel decomposition (ops.layers.deconv_phase_kernel): a 2-tap
    phase conv with the zero tap at LO instead of HI, and the stride-1 9x9
    final deconv is exactly a SAME conv with the flipped io-swapped kernel."""
    return upsample_method in UPSAMPLE_METHODS and h >= 8 and w >= 8


def apply(
    params: Params,
    x: jax.Array,
    upsample_method: str = "resize",
    *,
    fused_upsample: bool = True,
    compute_dtype=None,
    layout: str = "auto",
    output_dtype=None,
    batch_mode: str = "map",
) -> jax.Array:
    """Forward pass. `x`: NHWC, RGB in [0,255]; returns same shape in [0,255].

    `layout`: 'auto' picks the packed (space-to-depth) MXU fast path when the
    shape supports it (see packed_layout_supported) and falls back to the
    naive NHWC path otherwise; 'packed'/'naive' force a path.
    `fused_upsample` selects the phase-decomposed exact rewrite of the
    resize-convolution (ops.layers.upsample_conv) on the naive path; False
    runs the literal resize-then-conv formulation for cross-checking.
    `compute_dtype` (e.g. jnp.bfloat16) casts activations for the conv stack;
    instance-norm statistics and the final tanh always run in float32.
    `output_dtype=jnp.uint8` clips to [0,255] and casts ON DEVICE; on the
    packed path the cast lands BEFORE the unpack relayout, so the C=3
    boundary copies (the 1080p bottleneck — docs/PERF.md) move 1-byte
    elements. uint8 input is likewise packed in uint8 and cast to the
    compute dtype afterwards (0..255 integers are exact in bf16, so this
    changes no math). Defaults to uint8-in -> uint8-out, float-in -> same
    float out.
    `batch_mode` is forwarded to apply_packed for batched inputs: 'map'
    (per-sample lax.map — the measured-faster program for inference),
    'unroll' (the same per-sample programs as independent subgraphs —
    faster under autodiff, what the train step uses), or 'direct' (one
    batched program — faster for the tnet fwd+bwd in ISOLATION but slower
    once XLA schedules it against the VGG towers; docs/PERF.md).
    """
    assert upsample_method in UPSAMPLE_METHODS
    assert layout in ("auto", "packed", "naive")
    assert output_dtype in (None, jnp.uint8), output_dtype
    if output_dtype is None and x.dtype == jnp.uint8:
        output_dtype = jnp.uint8
    if layout == "packed" or (
        layout == "auto" and packed_layout_supported(x.shape[1], x.shape[2], upsample_method)
    ):
        return apply_packed(
            params,
            x,
            compute_dtype=compute_dtype,
            output_dtype=output_dtype,
            upsample_method=upsample_method,
            batch_mode=batch_mode,
        )
    # Naive NHWC path: the single definition of the architecture walk lives
    # in apply_with_features; the unused feature taps are dead outputs XLA
    # eliminates under jit.
    h, _ = apply_with_features(
        params,
        x,
        upsample_method,
        fused_upsample=fused_upsample,
        compute_dtype=compute_dtype,
    )
    if output_dtype == jnp.uint8:
        return jnp.clip(h, 0, 255).astype(jnp.uint8)
    return h


# packed-grid geometries (shape-independent); see ops.packed.axis_geom
_G_INIT0 = PK.axis_geom(p_in=4, p_out=4, stride=1, k=9, pad_lo=4)  # SAME pad 4
_G_RES = PK.axis_geom(2, 2, 1, 3, 0)  # VALID
_G_UP = PK.axis_geom(2, 2, 1, 2, 0)  # fused-upsample phase conv (zero hi tap)
_G_UP_DECONV = PK.axis_geom(2, 2, 1, 2, 1)  # deconv phase conv (zero LO tap)
_G_FINAL = PK.axis_geom(4, 4, 1, 9, 4)
# fine-pixel (fy, fx) offset of each channel position group in upsample_0's
# grouped output order (dy, dx, (py, px, c)): group g = ((dy*2+dx)*2+py)*2+px
# sits at (2*dy + py, 2*dx + px) within its p=4 block. Feeds the masked-IN /
# zero_tail bookkeeping on ragged extents (ops.packed._pos_offsets).
_GROUPED_POS4 = tuple(
    (2 * dy + py, 2 * dx + px)
    for dy in (0, 1)
    for dx in (0, 1)
    for py in (0, 1)
    for px in (0, 1)
)

# SAME stride-2 k3: TF pads (0,1) for even input, (1,1) for odd -> pad_lo by parity
_G_S2 = {
    (4, 0): PK.axis_geom(4, 2, 2, 3, 0),
    (4, 1): PK.axis_geom(4, 2, 2, 3, 1),
    (2, 0): PK.axis_geom(2, 2, 2, 3, 0),
    (2, 1): PK.axis_geom(2, 2, 2, 3, 1),
}


def _s2_geom(p_in: int, l: int) -> PK.AxisGeom:
    # TF SAME k3 s2: pad_total = 1 for even l, 2 for odd -> pad_lo 0 / 1
    return _G_S2[(p_in, 0 if l % 2 == 0 else 1)]


def pack_all_kernels(
    params: Params, h: int, w: int, dtype, upsample_method: str = "resize"
) -> Dict[str, jax.Array]:
    """Pack every conv kernel for input size (h, w) ONCE. Hoisted out of the
    per-sample body so batched execution (lax.map) neither re-packs per
    sample nor re-differentiates the packing per sample (the packing VJP
    then runs once per step, not once per sample).

    For 'deconv' models the upsample stages pack the sub-pixel decomposition
    (ops.layers.deconv_phase_kernel, zero tap at LO -> _G_UP_DECONV) and the
    stride-1 9x9 final deconv packs as a SAME conv with the adjoint (flipped,
    io-swapped) kernel."""
    cd = PK.ceil_div
    pk: Dict[str, jax.Array] = {}
    lh, lw = h + 80, w + 80
    pk["initconv_0"] = PK.pack_kernel(
        params["initconv_0"]["W"].astype(dtype), _G_INIT0, _G_INIT0
    )
    pk["initconv_1"] = PK.pack_kernel(
        params["initconv_1"]["W"].astype(dtype), _s2_geom(4, lh), _s2_geom(4, lw)
    )
    lh, lw = cd(lh, 2), cd(lw, 2)
    pk["initconv_2"] = PK.pack_kernel(
        params["initconv_2"]["W"].astype(dtype), _s2_geom(2, lh), _s2_geom(2, lw)
    )
    for i in range(_NUM_RESBLOCKS):
        blk = params[f"resblock_{i}"]
        pk[f"resblock_{i}_1"] = PK.pack_kernel(blk["W1"].astype(dtype), _G_RES, _G_RES)
        pk[f"resblock_{i}_2"] = PK.pack_kernel(blk["W2"].astype(dtype), _G_RES, _G_RES)
    deconv = upsample_method == "deconv"
    g_up = _G_UP_DECONV if deconv else _G_UP
    for i, c_out in ((0, 32), (1, 16)):
        w_up = params[f"upsample_{i}"]["W"]
        phase = (
            L.deconv_phase_kernel(w_up) if deconv else L.upsample_phase_kernel(w_up)
        ).astype(dtype)
        ku = PK.pack_kernel(phase, g_up, g_up)
        if i == 0:
            # upsample_0 keeps the conv's NATURAL grouped output order
            # (dy, dx, (py, px, c)): the p4->p2 mid-repack then becomes one
            # block depth-to-space with the 4*c_out=128 lane dim contiguous
            # (round-4; replaced the unpack->slice->repack through full NHWC
            # whose narrow 32/12-wide minor dims were the measured boundary
            # bottleneck — docs/PERF.md, _apply_packed_one)
            pk["upsample_0"] = ku
        else:
            # upsample_1 interleaves to the standard p4 packing its consumer
            # (the 9x9 _G_FINAL conv) expects
            pk[f"upsample_{i}"] = PK.permute_upsample_out(
                ku, p_out=2, phase=2, c_real=c_out
            )
    w_fin = params["upsample_2"]["W"]
    if deconv:  # s1 SAME transposed conv == SAME conv with the adjoint kernel
        w_fin = jnp.flip(w_fin, axis=(0, 1)).transpose(0, 1, 3, 2)
    pk["upsample_2"] = PK.pack_kernel(w_fin.astype(dtype), _G_FINAL, _G_FINAL)
    return pk


def apply_packed(
    params: Params,
    x: jax.Array,
    *,
    compute_dtype=None,
    batch_mode: str = "map",
    output_dtype=None,
    output_layout: str = "nhwc",
    input_layout: str = "nhwc",
    input_hw: tuple[int, int] | None = None,
    upsample_method: str = "resize",
) -> jax.Array:
    """Space-to-depth execution of the net (both upsample variants — the
    'deconv' upsamples ride the same walk via their sub-pixel phase
    decomposition, see pack_all_kernels): one pack at the input,
    one repack mid-upsampling, one unpack at the output; every conv runs on a
    packed grid with 48..512-wide channel dims (see ops.packed). Exact
    relayout of `apply` — same dot products, MXU-friendly shapes.

    Supports ANY input size: each stage tracks its logical extent; packed
    tensors carry zeroed garbage tails (re-zeroed after ops that disturb
    them) and instance-norm statistics use masked counts, so ragged sizes
    are exact relayouts too — verified against the naive path at odd and
    prime sizes. All masking is a static no-op for aligned shapes.

    Layout walk (input [N,H,W,3], Hp=H+80; block counts are ceil-divisions):
      pack p=4               [Hp/4, Wp/4, 48]
      initconv_0 (q=3)       [Hp/4, Wp/4, 256]   full-res p=4, c=16
      initconv_1 (q=2)       [Hp/4, Wp/4, 128]   half-res p=2, c=32
      initconv_2 (q=3, t=2)  [Hp/8, Wp/8, 256]   quarter-res p=2, c=64
      5 x resblock (q=2)     shrink 1 packed px/conv (== 2 full px, exact)
      upsample_0 (q=2)       half'-res, grouped order (dy,dx,(py,px,c)), c=32
      block d2s p4 -> p2     half'-res p=2 (one 128-lane-contiguous transpose)
      upsample_1 (q=2)       full'-res p=4, c=16 (phase-permuted kernel)
      upsample_2 (q=3)       full'-res p=4, c=3 -> unpack == [N,H,W,3]
    """
    orig_dtype = x.dtype
    assert input_layout in ("nhwc", "packed_u8")
    if input_layout == "packed_u8":
        # x: [N, ceil((h+80)/4), ceil((w+80)/4), 48] uint8 from
        # inference.pack_u8_host; (h, w) is the logical image extent (static)
        assert orig_dtype == jnp.uint8 and input_hw is not None
        n, h, w = x.shape[0], *input_hw
    else:
        n, h, w, _ = x.shape
    if orig_dtype == jnp.uint8 and output_dtype is None:
        output_dtype = jnp.uint8
    assert output_dtype in (None, jnp.uint8), output_dtype
    assert output_layout in ("nhwc", "packed_u8")
    if output_layout == "packed_u8":
        assert output_dtype == jnp.uint8, "packed_u8 output implies uint8"
    dtype = compute_dtype if compute_dtype is not None else (
        jnp.float32 if orig_dtype == jnp.uint8 else x.dtype
    )
    assert batch_mode in ("map", "direct", "unroll")  # non-default modes
    # kept reachable for perf experiments (measurements in docs/PERF.md)
    assert upsample_method in UPSAMPLE_METHODS
    pk = pack_all_kernels(params, h, w, dtype, upsample_method)
    up_geom = _G_UP_DECONV if upsample_method == "deconv" else _G_UP
    if n > 1 and batch_mode == "map":
        # XLA schedules the packed convs markedly worse with a batch dim
        # (measured 2.8x/frame at 1080p b=2; H-folding measured no better —
        # docs/PERF.md); sequential per-sample execution reuses the
        # well-tiled b=1 program. Instance norm is per-sample anyway, so
        # this changes nothing semantically. pk is loop-invariant: its
        # gradient accumulates across iterations inside the scan.
        return _cast_out(
            jax.lax.map(
                lambda img: _apply_packed_one(
                    pk, params, img[None], dtype, output_dtype, output_layout,
                    pre_packed_hw=input_hw if input_layout == "packed_u8" else None,
                    up_geom=up_geom,
                )[0],
                x,
            ),
            orig_dtype,
            output_dtype,
        )
    if n > 1 and batch_mode == "unroll":
        # Unrolled per-sample execution: same b=1 programs as 'map', but as
        # n independent subgraphs instead of a scan — XLA can interleave
        # samples, and the loop-invariant packed-kernel cotangents tree-sum
        # at the end instead of serializing through the scan carry (the
        # select_add accumulations profiled ~1 ms/step at b4@256).
        outs = [
            _apply_packed_one(
                pk, params, x[i : i + 1], dtype, output_dtype, output_layout,
                pre_packed_hw=input_hw if input_layout == "packed_u8" else None,
                up_geom=up_geom,
            )
            for i in range(n)
        ]
        return _cast_out(jnp.concatenate(outs, axis=0), orig_dtype, output_dtype)
    return _cast_out(
        _apply_packed_one(
            pk, params, x, dtype, output_dtype, output_layout,
            pre_packed_hw=input_hw if input_layout == "packed_u8" else None,
            up_geom=up_geom,
        ),
        orig_dtype,
        output_dtype,
    )


def _cast_out(y: jax.Array, orig_dtype, output_dtype=None) -> jax.Array:
    """Cast the unpacked output back to the caller's dtype BEHIND an
    optimization barrier: without it XLA hoists the f32 convert above the
    unpack transposes, doubling the bytes those layout copies move (measured
    9.21 -> 8.60 ms/frame at 1080p). Below ~1 MP the copies fuse anyway and
    the barrier only adds a materialization (256px: 0.94 -> 1.33 ms), so it
    is size-gated. Measurements: docs/PERF.md.

    With output_dtype=uint8 the clip+cast already happened pre-unpack inside
    _apply_packed_one (the whole point: 1-byte relayouts) — nothing to do."""
    if output_dtype == jnp.uint8 or y.dtype == orig_dtype:
        return y
    if y.shape[1] * y.shape[2] >= 700_000:
        y = jax.lax.optimization_barrier(y)
    return y.astype(orig_dtype)


def _apply_packed_one(
    pk: Dict[str, jax.Array],
    params: Params,
    x: jax.Array,
    dtype,
    output_dtype=None,
    output_layout: str = "nhwc",
    in_norm=None,
    pre_padded: bool = False,
    pre_packed_hw: tuple[int, int] | None = None,
    up_geom: PK.AxisGeom = _G_UP,
) -> jax.Array:
    """`in_norm`: optional override for the instance-norm statistic pass,
    `(t, scale, shift, p, lh, lw) -> normalized t`. Used by
    parallel.spatial to psum interval-masked moments across a mesh (the
    window's local extents lh/lw are what the override needs to map its own
    global bookkeeping onto). None = the standard masked single-device IN.

    `pre_padded`: x already carries the 40px reflect pad (parallel.spatial
    slices shard windows out of a globally padded image); skip padding and
    treat x's extents as the padded ones.

    `pre_packed_hw`: x is already the PACKED padded uint8 tensor from
    inference.pack_u8_host (host did reflect-pad + space-to-depth); the
    tuple carries the logical (h, w) the packed shape can't disambiguate."""
    if pre_packed_hw is not None:
        n, (h, w) = x.shape[0], pre_packed_hw
    else:
        n, h, w, _ = x.shape
        if pre_padded:
            h, w = h - 80, w - 80
    input_u8 = x.dtype == jnp.uint8
    if not input_u8 and x.dtype != dtype:
        x = x.astype(dtype)

    cd = PK.ceil_div

    def norm(t, blk, p, c, lh, lw, sfx="", relu=True, pos_map=None):
        """IN with masked counts on ragged tensors; the affine shift makes
        the zero tail nonzero, so re-zero it (static no-op when aligned).
        `pos_map` names a permuted channel position order (the grouped
        upsample_0 output) for the mask/tail bookkeeping."""
        scale, shift = blk["INscale" + sfx], blk["INshift" + sfx]
        if in_norm is not None:
            t = in_norm(t, scale, shift, p, lh, lw)
        else:
            aligned = t.shape[1] * p == lh and t.shape[2] * p == lw
            t = PK.instance_norm_packed(
                t,
                scale,
                shift,
                p,
                valid_hw=None if aligned else (lh, lw),
                pos_map=pos_map,
            )
        if relu:
            t = L.relu(t)
        return PK.zero_tail(t, p, c, lh, lw, pos_map=pos_map)

    def conv(z, kernel, gh, gw, p_out, c_out, lh_out, lw_out):
        """Packed conv emitting exactly ceil(l_out/p_out) blocks; tail
        positions (computed from valid data) are re-zeroed to keep the
        zero-tail invariant every SAME read depends on. zero_tail is a
        static no-op when the extent is aligned."""
        z = PK.conv2d_packed(z, kernel, gh, gw, (cd(lh_out, p_out), cd(lw_out, p_out)))
        return PK.zero_tail(z, p_out, c_out, lh_out, lw_out)

    lh, lw = h + 80, w + 80
    # uint8 input stays uint8 through the pad+pack relayout (1-byte copies —
    # the input boundary cost at 1080p, docs/PERF.md) and casts after; 0..255
    # integers are exact in bf16/f32, so the cast position changes no math.
    # With pre_packed_hw the host already did pad+pack (zero tails per the
    # pack_u8_host contract) and the device starts at the cast.
    if pre_packed_hw is not None:
        z = x
    else:
        z = PK.pad_pack(x if pre_padded else L.reflect_pad(x, 40), 4)  # zero tails
    if input_u8:
        z = z.astype(dtype)

    blk = params["initconv_0"]  # 9x9 s1 SAME: logical size unchanged
    z = conv(z, pk["initconv_0"], _G_INIT0, _G_INIT0, 4, 16, lh, lw)
    z = norm(z, blk, 4, 16, lh, lw)

    blk = params["initconv_1"]  # 3x3 s2 SAME -> half res, p=2
    gh1, gw1 = _s2_geom(4, lh), _s2_geom(4, lw)
    lh, lw = cd(lh, 2), cd(lw, 2)
    z = conv(z, pk["initconv_1"], gh1, gw1, 2, 32, lh, lw)
    z = norm(z, blk, 2, 32, lh, lw)

    blk = params["initconv_2"]  # 3x3 s2 SAME -> quarter res, p=2
    gh2, gw2 = _s2_geom(2, lh), _s2_geom(2, lw)
    lh, lw = cd(lh, 2), cd(lw, 2)
    z = conv(z, pk["initconv_2"], gh2, gw2, 2, 64, lh, lw)
    z = norm(z, blk, 2, 64, lh, lw)

    for i in range(_NUM_RESBLOCKS):
        blk = params[f"resblock_{i}"]
        r = conv(z, pk[f"resblock_{i}_1"], _G_RES, _G_RES, 2, 64, lh - 2, lw - 2)
        r = norm(r, blk, 2, 64, lh - 2, lw - 2, "1")
        r = conv(r, pk[f"resblock_{i}_2"], _G_RES, _G_RES, 2, 64, lh - 4, lw - 4)
        r = norm(r, blk, 2, 64, lh - 4, lw - 4, "2", relu=False)
        # crop 1 packed px/side == the 2 full-res px crop; the skip slice can
        # carry one extra valid row/col in its tail — the add re-masks it
        lh, lw = lh - 4, lw - 4
        z = r + z[:, 1 : 1 + r.shape[1], 1 : 1 + r.shape[2], :]
        z = PK.zero_tail(z, 2, 64, lh, lw)

    for i, c_out in ((0, 32), (1, 16)):
        blk = params[f"upsample_{i}"]
        lh, lw = 2 * lh, 2 * lw  # net 2x upsample on the finer grid
        z = PK.conv2d_packed(z, pk[f"upsample_{i}"], up_geom, up_geom, (cd(lh, 4), cd(lw, 4)))
        if i == 0:
            # upsample_0's kernel emits the GROUPED order (dy, dx, (py,px,c))
            # — each output block holds a 2x2 patch of coarse pixels, each a
            # (py,px,c) 4*c_out bundle — so the p4->p2 repack is ONE block
            # depth-to-space (unpack_nhwc with 4*c_out-wide "pixels": the
            # 128-lane minor dim stays contiguous; no narrow shuffles). The
            # result IS the standard p2 packing of the half-res grid.
            if in_norm is None:
                # IN first, at p=4 in grouped order — the p^2-group fold is
                # order-invariant, XLA keeps the stats fused in the conv
                # epilogue, and the d2s then moves post-norm bf16
                # (norm-after-d2s measured +0.35 ms/frame at 1080p: XLA
                # hoists the stats' f32 upcast above the repack copies).
                # Ragged extents (round 5) ride the same order: the masked
                # counts and tail re-zeroing take _GROUPED_POS4, so only the
                # block slice after the d2s differs from the aligned case.
                # The conv's garbage tail must be zeroed BEFORE the masked
                # stats (their sums run over all positions and rely on the
                # zero-tail contract); static no-op when aligned.
                z = PK.zero_tail(z, 4, c_out, lh, lw, pos_map=_GROUPED_POS4)
                z = norm(z, blk, 4, c_out, lh, lw, pos_map=_GROUPED_POS4)
                z = PK.unpack_nhwc(z, 2, 4 * c_out)
                if z.shape[1] != cd(lh, 2) or z.shape[2] != cd(lw, 2):
                    # drop all-garbage half-res blocks; kept tails are
                    # already zeroed by the grouped-order zero_tail
                    z = z[:, : cd(lh, 2), : cd(lw, 2), :]
            else:
                # distributed-IN (parallel.spatial) route: repack to standard
                # p2 first. The grouped-norm-first win has no mechanism here:
                # the moments pass through a psum over the mesh, and XLA
                # cannot fuse a collective into the conv epilogue — so the
                # d2s would move pre-norm data either way, and the interval
                # row masks keep their standard (dy, dx) order.
                z = PK.unpack_nhwc(z, 2, 4 * c_out)[:, : cd(lh, 2), : cd(lw, 2), :]
                z = PK.zero_tail(z, 2, c_out, lh, lw)
                z = norm(z, blk, 2, c_out, lh, lw)
        else:
            z = PK.zero_tail(z, 4, c_out, lh, lw)
            z = norm(z, blk, 4, c_out, lh, lw)

    blk = params["upsample_2"]  # 9x9 s1 SAME at full resolution
    z = conv(z, pk["upsample_2"], _G_FINAL, _G_FINAL, 4, 3, lh, lw)
    z = norm(z, blk, 4, 3, lh, lw, relu=False)
    z = L.scaled_tanh(z)
    if output_dtype == jnp.uint8:
        # clip+cast BEFORE the unpack so the boundary relayout moves 1-byte
        # elements (the reference clips on host, stylize_image.py:76; same
        # truncating semantics)
        z = jnp.clip(z, 0, 255).astype(jnp.uint8)
        if output_layout == "packed_u8":
            # skip the device-side unpack entirely (~1.4 ms/frame at 1080p,
            # shuffle-bound): the host interleaves via the native
            # depth-to-space (inference.unpack_u8_host), overlapped with the
            # next frame's device compute
            return z
    return PK.unpack_nhwc(z, 4, 3)[:, :lh, :lw, :]


def apply_with_features(
    params: Params,
    x: jax.Array,
    upsample_method: str = "resize",
    *,
    fused_upsample: bool = True,
    compute_dtype=None,
) -> tuple[jax.Array, Dict[str, jax.Array]]:
    """The naive NHWC forward pass, also returning intermediate activations
    (used directly for feature-matching teacher distillation,
    tools/distill_validation.py; `apply(layout='naive')` delegates here and
    drops the taps, so this is the ONE definition of the naive walk).

    Taps are PRE-nonlinearity (post instance-norm) so matching gradients are
    dense — a post-relu tap carries no gradient where the unit is off:
      init_0..2   : post-IN, pre-relu
      res_0..4    : residual block output (post skip-add, no relu by design)
      up_0..1     : post-IN, pre-relu
      pre_tanh    : final post-IN, before scaled_tanh

    Returns the pre-clip float output: uint8-in yields float out here (the
    clip+cast to uint8 is apply()'s output_dtype contract, not this fn's).
    """
    assert upsample_method in UPSAMPLE_METHODS
    orig_dtype = x.dtype
    if compute_dtype is not None or orig_dtype == jnp.uint8:
        x = x.astype(compute_dtype if compute_dtype is not None else jnp.float32)
    feats: Dict[str, jax.Array] = {}

    h = L.reflect_pad(x, 40)
    for i, (_k, _ci, _co, s) in enumerate(_INIT_SPECS):
        blk = params[f"initconv_{i}"]
        h = L.instance_norm(
            L.conv2d(h, blk["W"], stride=s, padding="SAME"),
            blk["INscale"], blk["INshift"],
        )
        feats[f"init_{i}"] = h
        h = L.relu(h)

    for i in range(_NUM_RESBLOCKS):
        blk = params[f"resblock_{i}"]
        r = L.conv2d(h, blk["W1"], stride=1, padding="VALID")
        r = L.relu(L.instance_norm(r, blk["INscale1"], blk["INshift1"]))
        r = L.conv2d(r, blk["W2"], stride=1, padding="VALID")
        r = L.instance_norm(r, blk["INscale2"], blk["INshift2"])
        h = r + h[:, 2:-2, 2:-2, :]
        feats[f"res_{i}"] = h

    for i in range(2):
        blk = params[f"upsample_{i}"]
        if upsample_method == "deconv":
            u = L.transposed_conv2d(h, blk["W"], stride=2)
        elif fused_upsample:
            u = L.upsample_conv(h, blk["W"])
        else:
            u = L.upsample_conv_reference(h, blk["W"])
        u = L.instance_norm(u, blk["INscale"], blk["INshift"])
        feats[f"up_{i}"] = u
        h = L.relu(u)

    blk = params["upsample_2"]
    if upsample_method == "deconv":
        h = L.transposed_conv2d(h, blk["W"], stride=1)
    else:
        h = L.conv2d(h, blk["W"], stride=1, padding="SAME")
    h = L.instance_norm(h, blk["INscale"], blk["INshift"])
    feats["pre_tanh"] = h
    y = L.scaled_tanh(h)
    if orig_dtype != jnp.uint8:
        y = y.astype(orig_dtype)
    return y, feats


def num_params(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
