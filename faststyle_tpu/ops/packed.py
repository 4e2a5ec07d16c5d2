"""Packed-layout (space-to-depth) convolution machinery — the MXU fast path.

The transform net's convs have tiny channel counts (3..64) that leave the
128-lane MXU nearly idle in NHWC layout: measured on TPU v5e, the full-res
9x9 3->16 conv runs at ~1.2 TFLOP/s and the 9x9 16->3 at ~0.5 TFLOP/s, vs
~150 TFLOP/s achievable at fat matmul shapes. The fix: execute the whole
stack in a packed layout — a p x p block of pixels becomes one super-pixel
with p^2*C channels, and every conv becomes an EXACT relayout with a small
packed-grid kernel (zero-filled where taps fall outside the receptive
field). Channel dims land in the 48..512 range where the MXU works.

Components:
  pack_nhwc / unpack_nhwc — [N,H,W,C] <-> [N,H/p,W/p,p^2*C]
  axis_geom               — packed-grid geometry (stride, taps, base offset)
  pack_kernel             — HWIO kernel -> packed kernel, as a single static
                            gather (traceable + differentiable, so training
                            can run the packed path too)
  packed_pads             — packed-grid zero padding for given lengths
  conv2d_packed           — the conv itself
  instance_norm_packed    — IN with per-REAL-channel stats in packed layout

Exactness: a packed conv performs the identical multiply-accumulates as the
full-res conv (kernel zeros contribute nothing); only fp accumulation order
may differ. Verified by allclose tests vs the naive path and by the golden
parity tests running through the packed path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def pack_nhwc(x: jax.Array, p: int) -> jax.Array:
    """[N,H,W,C] -> [N,H/p,W/p,p*p*C]; channel order (row_off, col_off, c)."""
    n, h, w, c = x.shape
    assert h % p == 0 and w % p == 0, (h, w, p)
    x = x.reshape(n, h // p, p, w // p, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // p, w // p, p * p * c)


def unpack_nhwc(x: jax.Array, p: int, c: int) -> jax.Array:
    """Inverse of pack_nhwc."""
    n, hp, wp, _ = x.shape
    x = x.reshape(n, hp, wp, p, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp * p, wp * p, c)


class AxisGeom(NamedTuple):
    """Packed-grid geometry of one conv axis.

    Full-res conv: output row o reads input rows s*o - pad_lo + a, a in [0,k).
    With o = p_out*O + dy, the packed input rows touched relative to t*O are
    B..B+q-1 where t = s*p_out/p_in (must divide exactly).
    """

    p_in: int
    p_out: int
    stride: int
    k: int
    pad_lo: int
    t: int
    q: int
    B: int


def axis_geom(p_in: int, p_out: int, stride: int, k: int, pad_lo: int) -> AxisGeom:
    t, rem = divmod(stride * p_out, p_in)
    assert rem == 0, f"p_in ({p_in}) must divide stride*p_out ({stride}*{p_out})"
    B = (-pad_lo) // p_in  # floor division handles the negative case
    U = (stride * (p_out - 1) + k - 1 - pad_lo) // p_in
    return AxisGeom(p_in, p_out, stride, k, pad_lo, t, U - B + 1, B)


def _axis_tap_index(g: AxisGeom) -> np.ndarray:
    """idx[u, ey, dy] = full-res kernel tap a, or -1 if out of range."""
    idx = np.full((g.q, g.p_in, g.p_out), -1, np.int64)
    for u in range(g.q):
        for ey in range(g.p_in):
            for dy in range(g.p_out):
                a = g.p_in * (g.B + u) + ey + g.pad_lo - g.stride * dy
                if 0 <= a < g.k:
                    idx[u, ey, dy] = a
    return idx


def _pack_kernel_fwd_impl(w_hwio: jax.Array, gh: AxisGeom, gw: AxisGeom) -> jax.Array:
    kh, kw, cin, cout = w_hwio.shape
    ah = _axis_tap_index(gh)  # [qh, pih, poh]
    aw = _axis_tap_index(gw)  # [qw, piw, pow]
    valid = (ah[:, :, :, None, None, None] >= 0) & (aw[None, None, None, :, :, :] >= 0)
    a_idx = np.clip(ah, 0, kh - 1)[:, :, :, None, None, None]
    b_idx = np.clip(aw, 0, kw - 1)[None, None, None, :, :, :]
    a_idx, b_idx = np.broadcast_arrays(a_idx, b_idx)
    # gather -> [qh, pih, poh, qw, piw, pow, cin, cout]; indices stay static
    # numpy so this traces as one gather with constant indices
    pk = jnp.asarray(w_hwio)[a_idx, b_idx]
    pk = jnp.where(valid[..., None, None], pk, 0)
    # -> [qh, qw, (ey, ex, ci), (dy, dx, co)]
    pk = pk.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    qh, qw = gh.q, gw.q
    return pk.reshape(qh, qw, gh.p_in * gw.p_in * cin, gh.p_out * gw.p_out * cout)


def _axis_inverse_tap_index(g: AxisGeom, k: int):
    """Inverse of _axis_tap_index: for (tap a, out-phase dy) the unique packed
    (u, ey) that reads it, or invalid. a = p_in*(B+u) + ey + pad_lo - s*dy
    determines (u, ey) uniquely since ey < p_in."""
    u = np.zeros((k, g.p_out), np.int64)
    e = np.zeros((k, g.p_out), np.int64)
    valid = np.zeros((k, g.p_out), bool)
    for a in range(k):
        for dy in range(g.p_out):
            r = a - g.pad_lo + g.stride * dy - g.p_in * g.B
            if 0 <= r < g.p_in * g.q:
                u[a, dy], e[a, dy] = divmod(r, g.p_in)
                valid[a, dy] = True
    return u, e, valid


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _pack_kernel_cv(w_hwio, gh, gw):
    return _pack_kernel_fwd_impl(w_hwio, gh, gw)


def _pack_kernel_cv_fwd(w_hwio, gh, gw):
    # residual: a zero-size dtype token (shapes reconstruct from gh/gw/ct)
    return _pack_kernel_fwd_impl(w_hwio, gh, gw), jnp.zeros((0,), w_hwio.dtype)


def _pack_kernel_cv_bwd(gh, gw, res, ct):
    """VJP as another static gather: the forward scatters each tap (a, b) to
    exactly one packed slot per output phase (dy, dx), so the transpose is a
    gather over (a, dy) x (b, dx) summed over phases — no TPU scatter-add
    (autodiff's gather transpose), which measured ~6x slower."""
    dtype = res.dtype
    kh, kw = gh.k, gw.k
    qh, qw = gh.q, gw.q
    cin = ct.shape[2] // (gh.p_in * gw.p_in)
    cout = ct.shape[3] // (gh.p_out * gw.p_out)
    g = ct.reshape(qh, qw, gh.p_in, gw.p_in, cin, gh.p_out, gw.p_out, cout)
    g = g.transpose(0, 2, 5, 1, 3, 6, 4, 7)  # [qh,pih,poh,qw,piw,pow,ci,co]
    uh, eh, vh = _axis_inverse_tap_index(gh, kh)  # [kh, poh]
    uw, ew, vw = _axis_inverse_tap_index(gw, kw)  # [kw, pow]
    dyi = np.broadcast_to(np.arange(gh.p_out), (kh, gh.p_out))
    dxi = np.broadcast_to(np.arange(gw.p_out), (kw, gw.p_out))
    # gather -> [kh, poh, kw, pow, ci, co]
    gat = g[
        uh[:, :, None, None],
        eh[:, :, None, None],
        dyi[:, :, None, None],
        uw[None, None, :, :],
        ew[None, None, :, :],
        dxi[None, None, :, :],
    ]
    mask = (vh[:, :, None, None] & vw[None, None, :, :])[..., None, None]
    gat = jnp.where(mask, gat, 0)
    grad = jnp.sum(gat.astype(jnp.float32), axis=(1, 3))
    return (grad.astype(dtype),)


_pack_kernel_cv.defvjp(_pack_kernel_cv_fwd, _pack_kernel_cv_bwd)


def pack_kernel(w_hwio: jax.Array, gh: AxisGeom, gw: AxisGeom) -> jax.Array:
    """HWIO kernel -> packed kernel [qh, qw, p_in^2*Cin, p_out^2*Cout].

    One static fancy-index gather + mask: traceable under jit and
    differentiable (custom VJP — the transpose is also a static gather, see
    _pack_kernel_cv_bwd), so the packed path is usable in training."""
    return _pack_kernel_cv(w_hwio, gh, gw)


def packed_pads(g: AxisGeom, in_packed: int, out_packed: int) -> Tuple[int, int]:
    """Packed-grid zero padding (lo, hi) so the packed VALID conv emits
    exactly out_packed rows."""
    lo = max(0, -g.B)
    hi = g.t * (out_packed - 1) + (g.B + g.q - 1) - (in_packed - 1)
    # hi < 0 would mean the caller asked for FEWER rows than the VALID conv
    # emits — clamping would silently break the exact-row-count postcondition
    # every downstream extent computation relies on.
    assert hi >= 0, (
        f"out_packed={out_packed} under-consumes in_packed={in_packed} for {g}"
    )
    return lo, hi


def conv2d_packed(
    x_packed: jax.Array,
    kernel: jax.Array,
    gh: AxisGeom,
    gw: AxisGeom,
    out_packed_hw: Tuple[int, int],
) -> jax.Array:
    """Run a packed conv. No preferred_element_type override: the MXU
    accumulates bf16 convs in f32 internally, and requesting an f32 output
    on bf16 inputs breaks lax's conv transpose rule under autodiff."""
    pad_h = packed_pads(gh, x_packed.shape[1], out_packed_hw[0])
    pad_w = packed_pads(gw, x_packed.shape[2], out_packed_hw[1])
    return lax.conv_general_dilated(
        x_packed,
        kernel.astype(x_packed.dtype),
        window_strides=(gh.t, gw.t),
        padding=(pad_h, pad_w),
        dimension_numbers=_DIMSPEC,
    ).astype(x_packed.dtype)


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def pad_pack(x: jax.Array, p: int) -> jax.Array:
    """Zero-pad H,W up to multiples of p, then pack. The zero tail is the
    invariant the ragged-size packed path relies on (see transform_net
    apply_packed): positions beyond the logical extent are always zero."""
    n, h, w, c = x.shape
    ph = ceil_div(h, p) * p - h
    pw = ceil_div(w, p) * p - w
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return pack_nhwc(x, p)


def _pos_offsets(p: int, pos_map) -> Tuple[np.ndarray, np.ndarray]:
    """(fy, fx) fine offsets of each of the p*p channel position groups.

    `pos_map=None` is the standard packing order (dy, dx): group g sits at
    (g // p, g % p). A non-None pos_map is a static tuple of (fy, fx) pairs
    for permuted orders — e.g. transform_net's grouped upsample_0 output
    (dy, dx, (py, px, c)), where group g sits at (2*dy + py, 2*dx + px)."""
    if pos_map is None:
        g = np.arange(p * p)
        return g // p, g % p
    pm = np.asarray(pos_map, np.int64)
    assert pm.shape == (p * p, 2), (pm.shape, p)
    return pm[:, 0], pm[:, 1]


def zero_tail(
    x_packed: jax.Array, p: int, c: int, lh: int, lw: int, *, pos_map=None
) -> jax.Array:
    """Re-zero positions beyond logical (lh, lw) in a packed tensor.

    Garbage only ever lives in the LAST block along each axis (convs emit
    exactly ceil(l/p) blocks). Static no-op when the extent divides p.
    `pos_map` names the channel position order (see _pos_offsets)."""
    n, gh, gw, cc = x_packed.shape
    th = gh * p - lh  # garbage rows in the last h-block
    tw = gw * p - lw
    if not th and not tw:
        return x_packed
    fy, fx = _pos_offsets(p, pos_map)
    if th:
        mask = np.repeat((fy < p - th).astype(np.float32), c)
        x_packed = x_packed.at[:, -1, :, :].multiply(jnp.asarray(mask, x_packed.dtype))
    if tw:
        mask = np.repeat((fx < p - tw).astype(np.float32), c)
        x_packed = x_packed.at[:, :, -1, :].multiply(jnp.asarray(mask, x_packed.dtype))
    return x_packed


def instance_norm_packed(
    x_packed: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    p: int,
    eps: float = 1e-3,
    *,
    valid_hw: Tuple[int, int] | None = None,
    pos_map=None,
) -> jax.Array:
    """Instance norm with statistics per REAL channel computed in packed
    layout: the p^2 position groups fold into the (H,W) reduction. Same
    moments as ops.layers.instance_norm (biased var, eps inside sqrt).

    `valid_hw`: logical (h, w) extent when the packed tensor carries a
    zeroed garbage tail (ragged sizes) — statistics divide by the true pixel
    count, and the variance stays two-pass with the mean's broadcast MASKED
    over the tail (so tail deltas are exactly zero; the one-pass E[x^2]-mu^2
    form could catastrophically cancel below -eps for near-constant
    high-magnitude maps and NaN through rsqrt). None (aligned case)
    bit-matches the naive path.

    `pos_map`: channel position order for the validity mask (see
    _pos_offsets) — lets the masked statistics run on permuted packings
    such as the grouped upsample_0 order without repacking first. Ignored
    when aligned (the p^2-group fold is order-invariant).

    A hand-written Pallas IN kernel was carried rounds 1-4 and measured
    SLOWER than XLA's fused reduce+elementwise on v5e at every shape tried
    (best rewrite 0.64 vs 0.47 ms at 290x500x256 bf16); in-net, XLA fuses
    the stats into the conv epilogues anyway. Retired in round 5 — the
    negative result lives in docs/PERF.md ("Pallas kernels — measured
    selection").
    """
    if valid_hw is not None:
        valid_hw = tuple(valid_hw)  # hashable for the nondiff argnum
    if pos_map is not None:
        pos_map = tuple(map(tuple, pos_map))  # likewise hashable
    return _in_packed_cv(x_packed, scale, shift, p, eps, valid_hw, pos_map)


def _in_mask(p: int, hp: int, wp: int, valid_hw, pos_map=None) -> jnp.ndarray | None:
    """Static {0,1} validity mask [1,hp,wp,p*p,1], or None when aligned."""
    if valid_hw is None:
        return None
    lh, lw = valid_hw
    if (lh, lw) == (hp * p, wp * p):
        return None
    fy, fx = _pos_offsets(p, pos_map)
    rows = np.arange(hp)[:, None] * p + fy[None, :]  # [hp, p*p] fine rows
    cols = np.arange(wp)[:, None] * p + fx[None, :]  # [wp, p*p] fine cols
    mask = ((rows[:, None, :] < lh) & (cols[None, :, :] < lw)).astype(np.float32)
    return jnp.asarray(mask.reshape(1, hp, wp, p * p, 1))


def _in_packed_moments(xf, p, valid_hw, hp, wp, pos_map=None):
    mask = _in_mask(p, hp, wp, valid_hw, pos_map)
    if mask is None:
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 3), keepdims=True)
        count = float(hp * p * wp * p)
    else:
        lh, lw = valid_hw
        count = float(lh * lw)
        mean = jnp.sum(xf, axis=(1, 2, 3), keepdims=True) / count
        # two-pass variance with the mean's broadcast masked to the valid
        # extent: tail positions give 0 - mean*0 = 0 exactly (x's tail is
        # zero per the caller contract — see zero_tail)
        var = jnp.sum(jnp.square(xf - mean * mask), axis=(1, 2, 3), keepdims=True) / count
    return mean, var, count, mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _in_packed_cv(x_packed, scale, shift, p, eps, valid_hw, pos_map):
    out, _ = _in_packed_fwd_math(x_packed, scale, shift, p, eps, valid_hw, pos_map)
    return out


def _in_packed_fwd_math(x_packed, scale, shift, p, eps, valid_hw, pos_map):
    n, hp, wp, cc = x_packed.shape
    c = cc // (p * p)
    xf = x_packed.astype(jnp.float32).reshape(n, hp, wp, p * p, c)
    mean, var, _count, _mask = _in_packed_moments(xf, p, valid_hw, hp, wp, pos_map)
    rstd = lax.rsqrt(var + eps)
    normed = (xf - mean) * rstd
    out = scale.astype(jnp.float32) * normed + shift.astype(jnp.float32)
    return out.reshape(n, hp, wp, cc).astype(x_packed.dtype), (mean, rstd)


def _in_packed_cv_fwd(x_packed, scale, shift, p, eps, valid_hw, pos_map):
    out, (mean, rstd) = _in_packed_fwd_math(
        x_packed, scale, shift, p, eps, valid_hw, pos_map
    )
    return out, (x_packed, scale, shift, mean, rstd)


def _in_packed_cv_bwd(p, eps, valid_hw, pos_map, res, g):
    """Classic normalization backward (2 fused reductions + 1 elementwise
    pass) in place of autodiff through the two-pass moments graph, which
    measured ~5.5 ms of a 20 ms b4@256 train step. Exact: the derivation
    only uses the caller contract that tail positions of x are zero (which
    makes sum((x - mean*mask)*mask) == 0 at the evaluation point)."""
    x_packed, scale, shift, mean, rstd = res
    n, hp, wp, cc = x_packed.shape
    c = cc // (p * p)
    xf = x_packed.astype(jnp.float32).reshape(n, hp, wp, p * p, c)
    gf = g.astype(jnp.float32).reshape(n, hp, wp, p * p, c)
    mask = _in_mask(p, hp, wp, valid_hw, pos_map)
    count = float(valid_hw[0] * valid_hw[1]) if mask is not None else float(hp * p * wp * p)
    xm = xf - mean
    u = jnp.sum(gf, axis=(1, 2, 3), keepdims=True)  # [n,1,1,1,c]
    t = jnp.sum(gf * xm, axis=(1, 2, 3), keepdims=True)
    s = scale.astype(jnp.float32)
    xc = xm if mask is None else xf - mean * mask
    dx = s * (rstd * (gf - u / count) - (rstd**3 / count) * xc * t)
    dscale = jnp.sum(rstd * t, axis=0).reshape(c)
    dshift = jnp.sum(u, axis=0).reshape(c)
    return (
        dx.reshape(n, hp, wp, cc).astype(x_packed.dtype),
        dscale.astype(scale.dtype),
        dshift.astype(shift.dtype),
    )


_in_packed_cv.defvjp(_in_packed_cv_fwd, _in_packed_cv_bwd)


def permute_upsample_out(kernel: jax.Array, p_out: int, phase: int, c_real: int) -> jax.Array:
    """Reorder a packed upsample kernel's output channels from
    (dy, dx, py, px, c) to ((dy,py), (dx,px), c).

    The fused resize-conv emits phase x phase finer-grid phases per coarse
    pixel (ops.layers.upsample_conv); after packed-grid packing the natural
    order interleaves wrong — permuting the kernel at build time makes the
    conv emit the finer grid's standard packing directly, free at runtime."""
    qh, qw, ci, co = kernel.shape
    k = kernel.reshape(qh, qw, ci, p_out, p_out, phase, phase, c_real)
    k = k.transpose(0, 1, 2, 3, 5, 4, 6, 7)
    return k.reshape(qh, qw, ci, co)
