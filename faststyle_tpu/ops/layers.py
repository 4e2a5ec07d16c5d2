"""Pure-functional layer primitives for the transform net and VGG tower.

TPU-native counterparts of the reference's TF1 layer zoo
(`/root/reference/im_transf_net.py:78-276`): NHWC activations, HWIO weights
(same layout as the TF1 checkpoints, so weight conversion is a straight copy),
everything expressed in `lax` ops that XLA tiles onto the MXU.

Numerical contracts replicated from the reference:
  * reflect_pad      — tf.pad REFLECT                  (im_transf_net.py:78-88)
  * conv2d SAME/VALID semantics                        (im_transf_net.py:91-119)
  * nearest-neighbor resize, align_corners=False       (im_transf_net.py:140-142)
  * instance norm: biased moments over H,W, eps=1e-3 inside sqrt
                                                       (im_transf_net.py:218-247)
  * scaled_tanh = (255*tanh(x) + 255) / 2              (im_transf_net.py:202-215)
  * transposed conv SAME (deconv upsampling)           (im_transf_net.py:158-190)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# Padding / resize
# ---------------------------------------------------------------------------


def reflect_pad(x: jax.Array, pad: int) -> jax.Array:
    """REFLECT-pad H and W of an NHWC tensor by `pad` px per side.

    Mirrors without repeating the border pixel — identical to TF's
    ``mode='REFLECT'`` (reference im_transf_net.py:86-88).
    """
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def resize_nearest(x: jax.Array, factor: int) -> jax.Array:
    """Integer-factor nearest-neighbor upsample of NHWC.

    For integer upscale factors, TF1's ``resize_images(method=NEAREST,
    align_corners=False)`` (reference im_transf_net.py:142) maps output pixel
    ``i -> floor(i / factor)``, which is exactly pixel replication.
    """
    x = jnp.repeat(x, factor, axis=1)
    x = jnp.repeat(x, factor, axis=2)
    return x


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jax.Array,
    w: jax.Array,
    stride: int = 1,
    padding: str = "SAME",
) -> jax.Array:
    """2-D convolution, NHWC activations x HWIO weights.

    SAME/VALID resolve to TF's asymmetric-pad convention (XLA's 'SAME' uses
    the identical `pad_total // 2` split), matching reference
    im_transf_net.py:115-118.

    No preferred_element_type override: the TPU MXU accumulates bf16 convs
    in f32 internally, and requesting an f32 output on bf16 inputs breaks
    lax's conv transpose rule under autodiff (f32 cotangent vs bf16 kernel).
    """
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DIMSPEC,
    ).astype(x.dtype)


def transposed_conv2d(x: jax.Array, w_hwoi: jax.Array, stride: int) -> jax.Array:
    """TF-compatible ``conv2d_transpose(..., padding='SAME')``.

    The reference builds its 'deconv' upsampling path with HWOI-layout filters
    and output_shape = input * stride (im_transf_net.py:172-189). TF defines
    SAME transposed conv as the adjoint of the SAME strided forward conv, i.e.
    dilate the input by `stride`, pad by (k-1-pad_lo, k-1-pad_hi) of the
    forward conv, and convolve with the spatially-flipped, io-swapped kernel.

    Restriction (same as the reference's static shapes): the produced output
    is exactly `H*stride x W*stride`.
    """
    k = w_hwoi.shape[0]
    out_h = x.shape[1] * stride
    out_w = x.shape[2] * stride

    def adjoint_pads(out_size: int) -> tuple[int, int]:
        # forward conv: out_size -> ceil(out_size/stride) with SAME padding
        fwd_out = (out_size + stride - 1) // stride
        pad_total = max((fwd_out - 1) * stride + k - out_size, 0)
        pad_lo = pad_total // 2
        pad_hi = pad_total - pad_lo
        return (k - 1 - pad_lo, k - 1 - pad_hi)

    ph = adjoint_pads(out_h)
    pw = adjoint_pads(out_w)
    # flip spatially and swap the io dims: HWOI -> HWIO of the adjoint kernel
    w_adj = jnp.flip(w_hwoi, axis=(0, 1)).transpose(0, 1, 3, 2)
    return lax.conv_general_dilated(
        x,
        w_adj.astype(x.dtype),
        window_strides=(1, 1),
        padding=(ph, pw),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMSPEC,
    ).astype(x.dtype)


def upsample_conv_reference(x: jax.Array, w: jax.Array) -> jax.Array:
    """Reference formulation of resize-convolution upsampling.

    NN-resize by stride^2 = 4x, then SAME conv with stride 2 — a net 2x
    upsample (reference im_transf_net.py:122-155). Kept as the numerical
    oracle for the fused fast path below; do not use on the hot path (it
    materializes a 16x-area intermediate).
    """
    up = resize_nearest(x, 4)
    return conv2d(up, w, stride=2, padding="SAME")


def upsample_phase_kernel(w: jax.Array) -> jax.Array:
    """3x3 HWIO kernel -> the 2-tap phase kernel [2,2,cin,4*cout] of the fused
    resize-convolution (see upsample_conv); phase order (hy,hx) row-major.

    Per axis: even output phase taps (w0+w1+w2, 0); odd phase taps (w0+w1, w2)
    — with a zero tap at x[H] (the SAME hi-pad of the reference formulation).
    """
    assert w.shape[0] == 3 and w.shape[1] == 3, "specialized for the net's 3x3 upsample convs"
    w = w.astype(jnp.float32)
    even_h = jnp.stack([w[0] + w[1] + w[2], jnp.zeros_like(w[0])], axis=0)  # [2,kw,ci,co]
    odd_h = jnp.stack([w[0] + w[1], w[2]], axis=0)
    phases = []
    for ph_h in (even_h, odd_h):
        even_w = jnp.stack([ph_h[:, 0] + ph_h[:, 1] + ph_h[:, 2], jnp.zeros_like(ph_h[:, 0])], axis=1)
        odd_w = jnp.stack([ph_h[:, 0] + ph_h[:, 1], ph_h[:, 2]], axis=1)
        phases.append(even_w)
        phases.append(odd_w)
    return jnp.concatenate(phases, axis=-1)


def deconv_phase_kernel(w_hwoi: jax.Array) -> jax.Array:
    """3x3 HWOI stride-2 SAME transposed-conv kernel -> the 2-tap phase
    kernel [2,2,cin,4*cout] of its sub-pixel decomposition; phase order
    (py,px) row-major, taps reading (x[m-1], x[m]) — i.e. a 2x2 VALID conv
    over x zero-padded by 1 at LO per axis (the mirror of the resize path's
    hi tap), followed by depth-to-space.

    Derivation (per axis; adjoint kernel v = flip(w), see transposed_conv2d):
    the s2 SAME transposed conv is a VALID k3 conv over the 2x-dilated input
    padded (2, 1); output o reads dilated positions o-2, o-1, o, of which
    only even ones are real pixels:
      o = 2m   -> v[0] x[m-1] + v[2] x[m]   (even phase: taps (v0, v2))
      o = 2m+1 -> v[1] x[m]                 (odd phase:  taps (0,  v1))
    """
    assert w_hwoi.shape[0] == 3 and w_hwoi.shape[1] == 3, "specialized for 3x3 deconvs"
    v = jnp.flip(w_hwoi, axis=(0, 1)).transpose(0, 1, 3, 2).astype(jnp.float32)
    even_h = jnp.stack([v[0], v[2]], axis=0)  # [2(t),3(b),ci,co]
    odd_h = jnp.stack([jnp.zeros_like(v[1]), v[1]], axis=0)
    phases = []
    for ph_h in (even_h, odd_h):
        even_w = jnp.stack([ph_h[:, 0], ph_h[:, 2]], axis=1)  # [2,2,ci,co]
        odd_w = jnp.stack([jnp.zeros_like(ph_h[:, 1]), ph_h[:, 1]], axis=1)
        phases.append(even_w)
        phases.append(odd_w)
    return jnp.concatenate(phases, axis=-1)


def transposed_conv2d_fused(x: jax.Array, w_hwoi: jax.Array) -> jax.Array:
    """Exact phase-decomposed rewrite of `transposed_conv2d(x, w, stride=2)`
    for 3x3 kernels: one 2x2 conv with 4*Cout channels + depth-to-space —
    no input dilation (XLA pays real multiplies for the dilation zeros).
    The packed fast path packs deconv_phase_kernel instead (transform_net)."""
    kh, kw, cout, cin = w_hwoi.shape
    w_packed = deconv_phase_kernel(w_hwoi)
    n, h, width, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))  # zero tap at x[-1]
    y = conv2d(xp, w_packed, stride=1, padding="VALID")  # [n,h,w,4*cout]
    y = y.reshape(n, h, width, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, 2 * h, 2 * width, cout)


def upsample_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    """Fused resize-convolution: exact phase decomposition of
    `upsample_conv_reference`, with 4x fewer FLOPs and no 16x intermediate.

    Derivation (per spatial axis, kernel k=3, input length H):
      u = NN4x(x); y[o] = sum_k w[k] * u[2o + k]   (SAME s2 on even 4H input
      pads 0 lo / 1 hi, so u[4H] = 0).
      o = 2m   -> taps u[4m..4m+2], all = x[m]:       y = (w0+w1+w2) x[m]
      o = 2m+1 -> taps u[4m+2..4m+4] = x[m],x[m],x[m+1]:
                                                      y = (w0+w1) x[m] + w2 x[m+1]
    The 2-D kernel decomposes per axis, giving four phase kernels that we pack
    into ONE 2x2 conv with 4*Cout channels (zero-padding the 1-tap axes), then
    interleave with a depth-to-space. A single fat conv keeps the MXU busier
    than the reference's thin 3x3 at 4x resolution.
    """
    kh, kw, cin, cout = w.shape
    w_packed = upsample_phase_kernel(w)
    n, h, width, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))  # zero tap at x[H] / x[W]
    y = conv2d(xp, w_packed, stride=1, padding="VALID")  # [n,h,w,4*cout]
    # depth-to-space: channel blocks (py, px) -> interleaved 2h x 2w
    y = y.reshape(n, h, width, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # n, h, py, w, px, c
    return y.reshape(n, 2 * h, 2 * width, cout)


# ---------------------------------------------------------------------------
# Normalization / activations
# ---------------------------------------------------------------------------


def instance_norm(
    x: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    eps: float = 1e-3,
) -> jax.Array:
    """Instance normalization over H,W with learnable per-channel affine.

    Matches reference im_transf_net.py:218-247: biased variance
    (``tf.nn.moments``), eps inside the sqrt, affine applied pre-activation.
    Moments are taken in float32 regardless of activation dtype.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    normed = (xf - mean) * lax.rsqrt(var + eps)
    out = scale.astype(jnp.float32) * normed + shift.astype(jnp.float32)
    return out.astype(x.dtype)


def scaled_tanh(x: jax.Array) -> jax.Array:
    """(255*tanh(x) + 255) / 2 -> output range [0, 255].

    Reference im_transf_net.py:202-215.
    """
    xf = x.astype(jnp.float32)
    return ((255.0 * jnp.tanh(xf) + 255.0) / 2.0).astype(x.dtype)


@jax.custom_vjp
def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def _relu_fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _relu_bwd(y, ct):
    # relu'(x) == (y > 0), so the OUTPUT is the only residual — without
    # this, autodiff of maximum(x, 0) keeps the pre-activation x alive too,
    # and XLA materializes both (the `broadcast_maximum` tuple outputs
    # profiled ~1 ms/step of the b4@256 train step, docs/PERF.md round 3).
    # Subgradient at exactly x == 0: this picks 0 (the TF/torch relu
    # convention); stock jnp.maximum tie-splits to 0.5 — both valid, the
    # difference is measure-zero for continuous activations.
    return (jnp.where(y > 0, ct, 0),)


relu.defvjp(_relu_fwd, _relu_bwd)


# ---------------------------------------------------------------------------
# Pooling (VGG)
# ---------------------------------------------------------------------------


def max_pool_2x2_same(x: jax.Array) -> jax.Array:
    """2x2/stride-2 SAME max-pool, NHWC (reference libs/vgg16.py:67-71).

    Even H and W (every training/loss shape: 256 -> 128 -> 64 -> 32) make
    SAME == VALID with non-overlapping windows, so the pool is an exact
    reshape + max over the window axes. That form matters for the BACKWARD:
    autodiff of reduce_window lowers to `select-and-scatter`, which profiled
    at ~1.2 ms/step of the b4@256 train step (docs/PERF.md round-3 trace);
    the reshape-max gradient is an eq-mask select + broadcast fusion. Odd
    extents keep the general reduce_window."""
    n, h, w, c = x.shape
    if h % 2 == 0 and w % 2 == 0:
        win = x.reshape(n, h // 2, 2, w // 2, 2, c)
        return jnp.max(win, axis=(2, 4))
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="SAME",
    )
