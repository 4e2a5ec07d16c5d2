"""Conv-only VGG16 feature tower for perceptual losses.

TPU-native counterpart of the reference's `libs/vgg16.py:26-266` (Frossard's
Caffe-converted VGG16 with fc layers removed): 13 conv layers (3x3 s1 SAME,
bias, relu) in 5 groups with 2x2 s2 SAME max-pools, preceded by ImageNet
mean subtraction on 0-255 RGB input (libs/vgg16.py:40-42 — subtract only, no
scaling).

The tower is a pure function returning a {layer_name: activation} dict and is
truncated at the deepest requested layer, so a loss on conv3_3 never pays for
conv4/conv5 compute (the reference always builds the full tower).

Weights pytree: {'conv1_1': {'W': [3,3,in,out], 'b': [out]}, ...} — HWIO,
identical to the `.npz` the reference downloads, so loading is a key-rename.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from faststyle_tpu.ops import layers as L


class PackedActivation(NamedTuple):
    """A block-1 activation in p=2 space-to-depth layout, [n, h/2, w/2, 4c]
    with channels ordered (dy, dx, c). Returned by apply(loss_layout=True)
    for conv1_1/conv1_2 so no relayout is paid: the perceptual losses are
    position-permutation-invariant, and losses.gram_matrix/content_loss
    consume this form exactly (Gram = diagonal phase-block fold of the
    packed Gram; elementwise losses compare packed-to-packed directly)."""

    data: jax.Array

    PHASES = 4  # p=2 -> 2x2 phase groups (class attr, not a pytree leaf)

# ImageNet channel means, reference libs/vgg16.py:41
_MEAN_RGB = (123.68, 116.779, 103.939)

# (name, out_channels); pools implicitly follow the last conv of each group
_GROUPS: Sequence[Sequence[str]] = (
    ("conv1_1", "conv1_2"),
    ("conv2_1", "conv2_2"),
    ("conv3_1", "conv3_2", "conv3_3"),
    ("conv4_1", "conv4_2", "conv4_3"),
    ("conv5_1", "conv5_2", "conv5_3"),
)
_CHANNELS = {1: 64, 2: 128, 3: 256, 4: 512, 5: 512}

LAYER_ORDER: List[str] = []
for _gi, _group in enumerate(_GROUPS, start=1):
    LAYER_ORDER.extend(_group)
    LAYER_ORDER.append(f"pool{_gi}")


def layer_index(name: str) -> int:
    return LAYER_ORDER.index(name)


def apply(
    params: Dict[str, Dict[str, jax.Array]],
    x: jax.Array,
    layers: Optional[Iterable[str]] = None,
    *,
    compute_dtype=None,
    loss_layout: bool = False,
    input_layer: Optional[str] = None,
) -> Dict[str, jax.Array]:
    """Run the tower on NHWC RGB [0,255]; return {layer: activation}.

    `layers` selects which activations the caller needs; compute stops after
    the deepest one. None returns every conv/pool activation.

    `loss_layout=True` runs block 1 space-to-depth packed (p=2): conv1_*'s
    Cin=3/N=64 starve the 128-wide MXU (measured: block 1 takes half the
    VGG forward for 14% of its FLOPs); packing lifts them to K=1024/N=256
    (block-1 fwd+bwd measured 3.8 -> 2.5 ms at b4@256 bf16). pool1 then
    becomes an exact max over the 4 phase groups, landing block 2 back in
    the normal layout; conv1_1/conv1_2 activations are returned as
    PackedActivation (no relayout paid — losses fold Grams and compare
    elementwise in packed form, both exactly). Opt-in for the loss paths
    (training/slow_style), NOT the default feature-extraction contract.

    `input_layer='pool<k>'` treats `x` as the pool<k> ACTIVATION (NHWC) and
    continues the tower from there — the continuation half of a split run
    (training.train_step's fused content tower runs [batch; y] jointly to a
    pool boundary, then continues only the y half into the deeper blocks).
    Mean subtraction is skipped; only pool boundaries are supported (conv
    activations can be in packed layout under loss_layout)."""
    wanted = set(layers) if layers is not None else set(LAYER_ORDER)
    unknown = wanted - set(LAYER_ORDER)
    if unknown:
        raise ValueError(f"unknown VGG16 layers: {sorted(unknown)}")
    deepest = max(layer_index(l) for l in wanted)

    acts: Dict[str, jax.Array] = {}

    def done():
        return (
            {k: v for k, v in acts.items() if k in wanted} if layers is not None else acts
        )

    if input_layer is not None:
        if input_layer not in LAYER_ORDER or not input_layer.startswith("pool"):
            raise ValueError(f"input_layer must be a pool boundary, got {input_layer}")
        idx = layer_index(input_layer) + 1
        if deepest < idx:
            raise ValueError(f"requested layers end before input_layer {input_layer}")
        dropped = [l for l in wanted if layer_index(l) < idx]
        if dropped:
            # A mixed request would otherwise silently lose the shallow
            # activations (the tower starts PAST them) and surface only much
            # later as a KeyError in the loss — or not at all.
            raise ValueError(
                f"layers {sorted(dropped)} are at or below input_layer "
                f"{input_layer} and cannot be computed from it"
            )
        start_group = int(input_layer[4:]) + 1
        h = x if compute_dtype is None else x.astype(compute_dtype)
        loss_layout = False  # packing applies to block 1 only; we start past it
    else:
        idx = 0
        start_group = 1
        h = x.astype(jnp.float32) - jnp.asarray(_MEAN_RGB, jnp.float32)
        if compute_dtype is not None:
            h = h.astype(compute_dtype)
    if loss_layout:
        from faststyle_tpu.ops import packed as PK

        g = PK.axis_geom(p_in=2, p_out=2, stride=1, k=3, pad_lo=1)  # SAME k3
        # block 1 starves the MXU (Cin=3 / N=64); run it packed at p=2 with
        # the trailing 2x2 pool as an exact max over the 4 phase groups.
        # Extending to block 2 MEASURED SLOWER (train step 13.8 -> 14.8 ms
        # at b4@256: the pool1->pack relayout plus the packed convs' known
        # batch-dim scheduling penalty outweigh the N=128 MXU gain), so the
        # loop covers block 1 only.
        for gi in (1,):
            if h.shape[1] % 2 or h.shape[2] % 2:
                break
            n, hh, ww = h.shape[0], h.shape[1] // 2, h.shape[2] // 2
            z = PK.pad_pack(h, 2)  # even sizes: no tail
            for name in _GROUPS[gi - 1]:
                p = params[name]
                k = PK.pack_kernel(p["W"].astype(h.dtype), g, g)
                z = PK.conv2d_packed(z, k, g, g, (hh, ww))
                z = L.relu(z + jnp.tile(p["b"], 4).astype(z.dtype))
                acts[name] = PackedActivation(z)
                if idx == deepest:
                    return done()
                idx += 1
            h = jnp.max(z.reshape(n, hh, ww, 4, z.shape[-1] // 4), axis=3)
            acts[f"pool{gi}"] = h
            if idx == deepest:
                return done()
            idx += 1
            start_group = gi + 1

    for gi, group in enumerate(_GROUPS[start_group - 1 :], start=start_group):
        for name in group:
            p = params[name]
            h = L.conv2d(h, p["W"], stride=1, padding="SAME")
            h = L.relu(h + p["b"].astype(h.dtype))
            acts[name] = h
            if idx == deepest:
                return done()
            idx += 1
        h = L.max_pool_2x2_same(h)
        acts[f"pool{gi}"] = h
        if idx == deepest:
            return done()
        idx += 1
    return acts


def load_npz(path) -> Dict[str, Dict[str, np.ndarray]]:
    """Load Frossard-format `vgg16_weights.npz` (keys `conv1_1_W`/`conv1_1_b`,
    fc* ignored) into the params pytree.

    The reference loads by sorted-key order into a parameters list
    (libs/vgg16.py:257-266); name-keyed loading is equivalent for this file
    and robust to ordering.
    """
    raw = np.load(path)
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for key in raw.files:
        if key.startswith("fc"):
            continue
        name, kind = key.rsplit("_", 1)
        if kind not in ("W", "b"):
            # an unknown suffix must not silently land as a bias (a stray
            # 'conv1_1_mean' key would clobber the real conv1_1 bias)
            raise ValueError(f"{path}: unrecognized weight key {key!r}")
        params.setdefault(name, {})[kind] = raw[key].astype(np.float32)
    missing = [n for g in _GROUPS for n in g if n not in params]
    if missing:
        raise ValueError(f"{path} missing VGG16 layers: {missing}")
    return params


def init_params(rng: jax.Array) -> Dict[str, Dict[str, jax.Array]]:
    """Random init with the reference's truncated-normal(0.1) / zero-bias
    scheme (libs/vgg16.py:46-50). Used for tests and as a fallback when the
    pretrained .npz is unavailable — perceptual losses need the pretrained
    weights to be meaningful."""
    params = {}
    cin = 3
    keys = jax.random.split(rng, 16)
    ki = 0
    for gi, group in enumerate(_GROUPS, start=1):
        cout = _CHANNELS[gi]
        for name in group:
            w = jax.random.truncated_normal(keys[ki % 16], -2, 2, (3, 3, cin, cout)) * 0.1
            params[name] = {"W": w.astype(jnp.float32), "b": jnp.zeros((cout,), jnp.float32)}
            cin = cout
            ki += 1
    return params
