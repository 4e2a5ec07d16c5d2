"""faststyle_tpu — a TPU-native (JAX/XLA/Pallas) fast neural style transfer framework.

A ground-up rebuild of the capabilities of ghwatson/faststyle (TF1/CUDA) as an
idiomatic JAX framework: pure-functional models, single-jit training steps,
`shard_map` data parallelism over a `jax.sharding.Mesh`, Pallas kernels for the
hot ops, and a host-side data pipeline with a native (C++) TFRecord codec.

Public surface:
    faststyle_tpu.models.transform_net   — Johnson-style image transform net
    faststyle_tpu.models.vgg16           — conv-only VGG16 feature tower
    faststyle_tpu.losses                 — content / style (Gram) / TV losses
    faststyle_tpu.training               — jitted train step + loop + checkpoints
    faststyle_tpu.parallel               — mesh helpers, DP train, sharded + spatial (row-sharded giant-frame) inference
    faststyle_tpu.data                   — TFRecord codec, dataset writer, input pipeline
    faststyle_tpu.compat                 — TF1 checkpoint read AND write / VGG .npz weight converters
    faststyle_tpu.utils                  — image I/O, metrics, profiling
    faststyle_tpu.cli                    — console entry points (reference-compatible flags)
"""

__version__ = "0.4.0"
