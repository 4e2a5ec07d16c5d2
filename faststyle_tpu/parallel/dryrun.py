"""Multi-chip dry run: compile + execute the full DP training step and the
batch-sharded inference path on an n-device mesh with tiny shapes.

Invoked by the driver via __graft_entry__.dryrun_multichip(n) on virtual CPU
devices; also usable on a real TPU slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from faststyle_tpu.models import transform_net, vgg16
from faststyle_tpu.parallel import data_parallel
from faststyle_tpu.parallel.mesh import data_mesh
from faststyle_tpu.training import slow_style
from faststyle_tpu.training.train_step import TrainConfig, init_state


def run(n_devices: int) -> None:
    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devices)} "
            "(set --xla_force_host_platform_device_count)"
        )
    mesh = data_mesh(devices[:n_devices])

    # tiny but real: full train step (transform net + VGG + losses + psum + adam)
    config = TrainConfig.make(learn_rate=1e-3, beta=1e-4)
    rng = jax.random.PRNGKey(0)
    vgg_params = vgg16.init_params(rng)
    state = init_state(rng, config)

    size = 32  # multiple of 4; VGG tower handles it down to pool5
    style = np.random.default_rng(0).uniform(0, 255, (1, size, size, 3)).astype(np.float32)
    style_layers = tuple(dict(config.style_weights))
    target_grams = slow_style.style_target_grams(vgg_params, style, style_layers)

    step_fn = data_parallel.make_dp_train_step(vgg_params, target_grams, config, mesh)
    batch = np.random.default_rng(1).uniform(
        0, 255, (2 * n_devices, size, size, 3)
    ).astype(np.float32)
    from faststyle_tpu.parallel.mesh import batch_sharding

    batch_dev = jax.device_put(batch, batch_sharding(mesh))
    state, metrics = step_fn(state, batch_dev)
    jax.block_until_ready(state.params)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"

    # batch-sharded inference across the mesh
    stylizer = data_parallel.ShardedStylizer(state.params, mesh)
    out = stylizer.stylize_batch(batch[: n_devices + 1])  # non-divisible batch too
    assert out.shape == (n_devices + 1, size, size, 3), out.shape
    assert np.isfinite(out).all()

    # round-4: the serving fast path + the deconv upsample variant, in one
    # compile — packed-u8 I/O (host pack/unpack, device pure packed compute)
    # through a 'deconv' model under shard_map. Frames must exceed the 40 px
    # reflect pad, hence the larger-than-`size` extent. Round-5: the frame is
    # RAGGED (odd extents, not mult-of-4) so the masked-tail geometry —
    # zeroed packed tails, masked-count instance norm, the grouped-order
    # upsample repack's ragged branch, and the output-shape law — is
    # exercised by the driver artifact every round, not just aligned sizes.
    deconv_params = transform_net.init_params(jax.random.PRNGKey(3), "deconv")
    packed = data_parallel.ShardedStylizer(
        deconv_params,
        mesh,
        upsample_method="deconv",
        packed_input=True,
        packed_output=True,
    )
    frames = np.random.default_rng(3).integers(
        0, 256, (n_devices, 45, 51, 3), dtype=np.uint8
    )
    p_out = packed.stylize_batch(frames)
    ohw = transform_net.output_shape(45, 51)  # ragged: (48, 52) per the law
    assert p_out.shape == (n_devices, *ohw, 3) and p_out.dtype == np.uint8, p_out.shape

    # spatially-partitioned single-image inference: rows sharded over the
    # mesh, instance-norm moments psum'd over ICI (parallel/spatial.py).
    # Width 43 is RAGGED (round-5): the distributed interval-masked IN and
    # the spatial route's grouped-order upsample repack run with active
    # column masks, so the masked-tail + collective-stats combination is
    # compiled and executed by the driver every round.
    from faststyle_tpu.parallel.spatial import SpatialStylizer

    big_h = 48 * n_devices  # aligned (H % (4n) == 0) with window room
    big = np.random.default_rng(2).uniform(0, 255, (big_h, 43, 3)).astype(np.float32)
    spatial = SpatialStylizer(state.params, mesh, halo=16)
    s_out = spatial(big)
    # ragged width follows the net's shape law: 43 -> 44 output cols
    assert s_out.shape == (big_h, transform_net.output_shape(1, 43)[1], 3), s_out.shape
    assert np.isfinite(s_out).all()
    assert spatial.shards_for(big_h) == n_devices
    print(
        f"[dryrun] {n_devices}-device mesh OK: train loss {loss:.4f}, "
        f"sharded inference {out.shape}, packed-u8 deconv serving "
        f"{p_out.shape} (ragged 45x51), spatial {s_out.shape} "
        f"({n_devices}-way rows, ragged width)"
    )
