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

Input contract: NHWC float, raw RGB in [0,255], H and W divisible by 4.
Output: same spatial size, range [0,255].

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


def _in_relu(x, blk):  # conv already applied
    return L.relu(L.instance_norm(x, blk["INscale"], blk["INshift"]))


def apply(
    params: Params,
    x: jax.Array,
    upsample_method: str = "resize",
    *,
    fused_upsample: bool = True,
    compute_dtype=None,
) -> jax.Array:
    """Forward pass. `x`: NHWC, RGB in [0,255]; returns same shape in [0,255].

    `fused_upsample` selects the phase-decomposed exact rewrite of the
    resize-convolution (ops.layers.upsample_conv); False runs the literal
    resize-then-conv formulation for cross-checking.
    `compute_dtype` (e.g. jnp.bfloat16) casts activations for the conv stack;
    instance-norm statistics and the final tanh always run in float32.
    """
    assert upsample_method in UPSAMPLE_METHODS
    orig_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    h = L.reflect_pad(x, 40)
    for i, (_k, _ci, _co, s) in enumerate(_INIT_SPECS):
        blk = params[f"initconv_{i}"]
        h = _in_relu(L.conv2d(h, blk["W"], stride=s, padding="SAME"), blk)

    for i in range(_NUM_RESBLOCKS):
        blk = params[f"resblock_{i}"]
        r = L.conv2d(h, blk["W1"], stride=1, padding="VALID")
        r = L.relu(L.instance_norm(r, blk["INscale1"], blk["INshift1"]))
        r = L.conv2d(r, blk["W2"], stride=1, padding="VALID")
        r = L.instance_norm(r, blk["INscale2"], blk["INshift2"])
        # center-crop the skip by 2 px/side: the VALID convs shrank r by 4
        h = r + h[:, 2:-2, 2:-2, :]

    for i in range(2):
        blk = params[f"upsample_{i}"]
        if upsample_method == "deconv":
            u = L.transposed_conv2d(h, blk["W"], stride=2)
        elif fused_upsample:
            u = L.upsample_conv(h, blk["W"])
        else:
            u = L.upsample_conv_reference(h, blk["W"])
        h = _in_relu(u, blk)

    blk = params["upsample_2"]
    if upsample_method == "deconv":
        h = L.transposed_conv2d(h, blk["W"], stride=1)
    else:
        h = L.conv2d(h, blk["W"], stride=1, padding="SAME")
    h = L.scaled_tanh(L.instance_norm(h, blk["INscale"], blk["INshift"]))
    return h.astype(orig_dtype)


def num_params(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
