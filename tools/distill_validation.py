#!/usr/bin/env python3
"""End-to-end training validation without VGG weights: teacher distillation.

The reference's core capability is producing a styled transform net by
training with pretrained-VGG perceptual losses (/root/reference/train.py:
108-290). This sandbox has zero egress, so `scripts/get_vgg16_weights.sh`
cannot fetch the 528 MB Frossard checkpoint (DNS resolution fails — see
docs/TRAINED_MODEL.md). The closest full-recipe validation that remains:

  train a FRESH transform net (reference init distributions, random seed)
  through the real machinery — data pipeline -> packed forward/backward ->
  Adam -> checkpoints -> CSV logging — against a pixel L2 loss to the
  SHIPPED starry teacher (a genuinely VGG-trained artifact). If the
  optimizer, custom VJPs, and packed gradients are correct, the student
  must converge to a visually styled model from scratch.

Chicago is held out of the training corpus entirely (see
tools/make_training_images.py); validation reports student-vs-teacher SSIM
on it at 256/512/native sizes.

Usage:
  python tools/make_training_images.py /tmp/train_imgs --num 400
  python tools/distill_validation.py --image_dir /tmp/train_imgs \
      --out models/starry_distilled.npz --steps 4000
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from faststyle_tpu import losses  # noqa: E402
from faststyle_tpu.data import pipeline  # noqa: E402
from faststyle_tpu.inference import load_params, save_params  # noqa: E402
from faststyle_tpu.models import transform_net  # noqa: E402
from faststyle_tpu.utils import image_io  # noqa: E402
from faststyle_tpu.utils.metrics import ssim  # noqa: E402
from faststyle_tpu.utils.profiling import enable_compilation_cache  # noqa: E402


def make_distill_step(
    learn_rate: float,
    compute_dtype,
    decay_steps: int = 0,
    feature_w: float = 1.0,
    gram_w: float = 0.0,
    ema_decay: float = 0.0,
    upsample_method: str = "resize",
):
    """Distillation step: pixel L2 to the teacher's output, plus (round 3)
    layer-wise feature matching against the teacher's intermediate
    activations (transform_net.apply_with_features). With identical
    architectures this is dense per-layer supervision — every layer is
    regressed onto its teacher counterpart, which converges far past what
    output-only pixel L2 reaches (SSIM 0.70 -> see docs/TRAINED_MODEL.md).

    Round 4 adds two terms aimed at closing the residual texture gap
    (SSIM 0.89-0.91 after round 3):

    - gram_w: second-order texture-statistics matching. The style content
      of these nets IS Gram statistics (the teachers were trained with
      losses.style_loss, the reference's /root/reference/losses.py:43-67),
      so the student's per-tap Gram matrices (losses.gram_matrix over the
      apply_with_features taps, c <= 64 so each Gram is a tiny [b,c,c]
      MXU matmul) are regressed onto the teacher's, each layer normalized
      by the teacher Gram's second moment.
    - ema_decay: a Polyak average of the student rides along and is what
      gets saved/evaluated — averages out the Adam noise floor that caps
      late-schedule convergence.

    Each layer's L2 is normalized by the teacher activation's second moment
    so all taps contribute at comparable scale regardless of depth/width;
    the pixel term is likewise normalized by mean(target^2). Reported
    `pixel_l2` stays the raw un-normalized mean square for curve continuity
    with the round-2 runs. feature_w=0, gram_w=0 recovers the round-2
    pure-pixel loss.
    """
    if decay_steps:
        learn_rate = optax.cosine_decay_schedule(learn_rate, decay_steps, alpha=0.02)
    opt = optax.adam(learn_rate)

    # teacher rides as a traced argument (not a closure constant) so the
    # compiled executable is teacher-independent: the candy run hits the
    # persistent compile cache warmed by the starry run (the naive-path
    # backward costs ~8 min of XLA compile on the tunneled runtime).
    def step(params, ema, opt_state, teacher, batch):
        target, t_feats = transform_net.apply_with_features(
            teacher, batch, upsample_method, compute_dtype=compute_dtype
        )
        target = jax.lax.stop_gradient(target)
        t_feats = jax.lax.stop_gradient(t_feats)

        def loss_fn(p):
            y, s_feats = transform_net.apply_with_features(
                p, batch, upsample_method, compute_dtype=compute_dtype
            )
            pix_raw = jnp.mean(jnp.square(y - target))
            loss = pix_raw / (jnp.mean(jnp.square(target)) + 1e-6)
            if feature_w:
                per_layer = [
                    jnp.mean(jnp.square(s_feats[k] - t_feats[k]))
                    / (jnp.mean(jnp.square(t_feats[k])) + 1e-6)
                    for k in sorted(t_feats)
                ]
                loss = loss + feature_w * sum(per_layer) / len(per_layer)
            if gram_w:
                # Grams in float32 (losses.gram_matrix accumulates f32) on
                # relu'd taps: texture statistics live in the post-activation
                # feature field, matching how the teachers' own style loss
                # saw VGG activations.
                per_gram = []
                for k in sorted(t_feats):
                    gs = losses.gram_matrix(jax.nn.relu(s_feats[k]))
                    gt = losses.gram_matrix(jax.nn.relu(t_feats[k]))
                    per_gram.append(
                        jnp.mean(jnp.square(gs - gt))
                        / (jnp.mean(jnp.square(gt)) + 1e-8)
                    )
                loss = loss + gram_w * sum(per_gram) / len(per_gram)
            return loss, pix_raw

        (loss, pix_raw), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_decay:
            ema = jax.tree.map(
                lambda e, p: e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay),
                ema, params,
            )
        return params, ema, opt_state, (loss, pix_raw)

    return jax.jit(step, donate_argnums=(0, 1, 2)), opt


def make_teacher_forcing_step(
    learn_rate: float,
    compute_dtype,
    decay_steps: int = 0,
    ema_decay: float = 0.0,
    upsample_method: str = "resize",
):
    """Per-layer TEACHER-FORCED distillation (round 4): each student layer is
    regressed onto the teacher's output of that layer given the TEACHER's own
    input to it (the taps `transform_net.apply_with_features` exposes) — 13
    independent shallow conv+IN regressions instead of one deep coupled one.

    Why: with identical architectures every sub-problem is an overdetermined
    shallow fit that converges essentially to the teacher's function; the
    round-3 end-to-end matching plateaued at SSIM ~0.90 because the joint
    problem's conditioning (every layer's gradient rides through every other
    layer's current error) caps late convergence — not capacity. A short
    end-to-end feature-matching fine-tune (make_distill_step) afterwards
    squashes the compounding of the per-layer residuals at inference time,
    when each student layer consumes the student's (not the teacher's)
    previous activation.

    Layer input mapping (mirrors apply_with_features' pre-relu taps):
    init_i reads relu(init_{i-1}); resblock_i reads res_{i-1} (no relu by
    design, /root/reference/im_transf_net.py:250-276); up_0 reads res_4;
    up_1 reads relu(up_0); the final 9x9 reads relu(up_1).
    """
    if decay_steps:
        learn_rate = optax.cosine_decay_schedule(learn_rate, decay_steps, alpha=0.02)
    opt = optax.adam(learn_rate)
    from faststyle_tpu.ops import layers as L

    deconv = upsample_method == "deconv"

    def step(params, ema, opt_state, teacher, batch):
        _, t = transform_net.apply_with_features(
            teacher, batch, upsample_method, compute_dtype=compute_dtype
        )
        t = jax.lax.stop_gradient(t)
        x0 = batch.astype(compute_dtype or jnp.float32)

        def loss_fn(p):
            terms = []

            def add(out, key):
                terms.append(
                    jnp.mean(jnp.square(out - t[key]))
                    / (jnp.mean(jnp.square(t[key])) + 1e-6)
                )

            padded = L.reflect_pad(x0, 40)
            for i, s in enumerate((1, 2, 2)):
                blk = p[f"initconv_{i}"]
                inp = padded if i == 0 else L.relu(t[f"init_{i-1}"])
                add(
                    L.instance_norm(
                        L.conv2d(inp, blk["W"], stride=s, padding="SAME"),
                        blk["INscale"], blk["INshift"],
                    ),
                    f"init_{i}",
                )
            for i in range(5):
                blk = p[f"resblock_{i}"]
                inp = L.relu(t["init_2"]) if i == 0 else t[f"res_{i-1}"]
                r = L.conv2d(inp, blk["W1"], stride=1, padding="VALID")
                r = L.relu(L.instance_norm(r, blk["INscale1"], blk["INshift1"]))
                r = L.conv2d(r, blk["W2"], stride=1, padding="VALID")
                r = L.instance_norm(r, blk["INscale2"], blk["INshift2"])
                add(r + inp[:, 2:-2, 2:-2, :], f"res_{i}")
            for i in range(2):
                blk = p[f"upsample_{i}"]
                inp = t["res_4"] if i == 0 else L.relu(t["up_0"])
                u = (
                    L.transposed_conv2d(inp, blk["W"], stride=2)
                    if deconv
                    else L.upsample_conv(inp, blk["W"])
                )
                add(
                    L.instance_norm(u, blk["INscale"], blk["INshift"]), f"up_{i}"
                )
            blk = p["upsample_2"]
            inp = L.relu(t["up_1"])
            h = (
                L.transposed_conv2d(inp, blk["W"], stride=1)
                if deconv
                else L.conv2d(inp, blk["W"], stride=1, padding="SAME")
            )
            add(L.instance_norm(h, blk["INscale"], blk["INshift"]), "pre_tanh")
            return sum(terms) / len(terms), terms[-1]

        (loss, out_term), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_decay:
            ema = jax.tree.map(
                lambda e, q: e * ema_decay + q.astype(e.dtype) * (1.0 - ema_decay),
                ema, params,
            )
        return params, ema, opt_state, (loss, out_term)

    return jax.jit(step, donate_argnums=(0, 1, 2)), opt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--teacher", default=str(REPO / "weights/starry_final.npz"))
    ap.add_argument("--out", default=str(REPO / "models/starry_distilled.npz"))
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--learn_rate", type=float, default=1e-3)
    ap.add_argument("--log_csv", default="")
    ap.add_argument(
        "--feature_w", type=float, default=1.0,
        help="weight on layer-wise teacher feature matching (0 = round-2 pure pixel L2)",
    )
    ap.add_argument(
        "--gram_w", type=float, default=0.0,
        help="weight on per-tap Gram (texture-statistics) matching vs the teacher",
    )
    ap.add_argument(
        "--ema_decay", type=float, default=0.0,
        help="Polyak-average the student and save/evaluate the average (0 = off)",
    )
    ap.add_argument(
        "--layerwise", action="store_true",
        help="teacher-forced per-layer regression phase (run first from "
        "scratch, then fine-tune end-to-end with --init_from; the metric "
        "column reports the normalized final-layer term, not raw pixel L2)",
    )
    ap.add_argument("--init_from", default="", help="warm-start from a saved student (continue training)")
    ap.add_argument("--precision", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument(
        "--upsample", default="resize", choices=["resize", "deconv"],
        help="teacher/student upsample variant (must match the teacher's)",
    )
    args = ap.parse_args()

    enable_compilation_cache()
    dtype = jnp.bfloat16 if args.precision == "bfloat16" else None

    teacher = jax.tree.map(jnp.asarray, load_params(args.teacher))
    if args.init_from:
        params = jax.tree.map(jnp.asarray, load_params(args.init_from))
    else:
        params = transform_net.init_params(jax.random.PRNGKey(0), args.upsample)
    ema = jax.tree.map(jnp.copy, params)
    if args.layerwise:
        step_fn, opt = make_teacher_forcing_step(
            args.learn_rate, dtype, decay_steps=args.steps,
            ema_decay=args.ema_decay, upsample_method=args.upsample,
        )
    else:
        step_fn, opt = make_distill_step(
            args.learn_rate, dtype, decay_steps=args.steps,
            feature_w=args.feature_w, gram_w=args.gram_w, ema_decay=args.ema_decay,
            upsample_method=args.upsample,
        )
    opt_state = opt.init(params)

    batcher = pipeline.image_dir_batcher(
        args.image_dir, args.batch_size, resize_shape=(256, 256), seed=1,
        min_after_dequeue=1000,
    )
    batches = pipeline.device_prefetch(iter(batcher))

    out = Path(args.out)
    if out.suffix != ".npz":
        # keep the suffix through the tmp-then-replace dance below —
        # load_params only probes .npz candidates
        out = Path(str(out) + ".npz")
    out.parent.mkdir(parents=True, exist_ok=True)

    def save(p):
        tmp = out.with_suffix(".tmp.npz")
        save_params(tmp, p)  # atomic: write-then-replace
        tmp.replace(out)

    # with EMA on, the Polyak average is the artifact we save and evaluate;
    # without it, `final` is just the live student
    final = lambda: ema if args.ema_decay else params  # noqa: E731

    rows = []
    t0 = time.perf_counter()
    for i in range(1, args.steps + 1):
        params, ema, opt_state, (loss, pix) = step_fn(
            params, ema, opt_state, teacher, next(batches)
        )
        if i % 100 == 0 or i == 1:
            loss_v, pix_v = float(loss), float(pix)
            rows.append((i, loss_v, pix_v, time.perf_counter() - t0))
            print(
                f"step {i:5d}  loss {loss_v:9.5f}  pixel-L2 {pix_v:10.3f}"
                f"  ({rows[-1][3]:.1f}s)",
                flush=True,
            )
        if i % 2000 == 0:
            save(final())  # periodic: a tunnel stall mid-run keeps the latest

    save(final())
    params = final()
    print(f"saved student model to {out}")
    if args.log_csv:
        with open(args.log_csv, "w") as f:
            f.write("step,loss,pixel_l2,seconds\n")
            f.writelines(f"{s},{l},{p},{t:.2f}\n" for s, l, p, t in rows)

    # held-out validation: chicago at multiple sizes, student vs teacher
    chicago = image_io.imread(REPO / "tests/assets/chicago.jpg").astype(np.float32)
    for tag, img in (
        ("256", image_io.imread(REPO / "tests/assets/chicago_crop256.png").astype(np.float32)),
        ("512", image_io.imread(REPO / "tests/assets/chicago_512.png").astype(np.float32)),
        ("native", chicago),
    ):
        x = jnp.asarray(img)[None]
        t = np.clip(np.asarray(transform_net.apply(teacher, x, compute_dtype=dtype))[0], 0, 255)
        s = np.clip(np.asarray(transform_net.apply(params, x, compute_dtype=dtype))[0], 0, 255)
        print(f"held-out chicago@{tag}: student-vs-teacher SSIM {ssim(s, t):.4f}")
        if tag == "native":
            image_io.imwrite("/tmp/distill_student_native.png", s.astype(np.uint8))
            image_io.imwrite("/tmp/distill_teacher_native.png", t.astype(np.uint8))


if __name__ == "__main__":
    main()
