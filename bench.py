#!/usr/bin/env python3
"""Benchmark harness. Prints ONE JSON line with the headline metric:
1080p stylization frames/sec on a single chip (BASELINE.md target: >= 60).

Extra measurements (512px fps, train step/sec, per-frame serving latency,
MFU, dispersion across repeats) are included under "details".
Run with --quick for a reduced frame count.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

TARGET_FPS_1080P = 60.0  # BASELINE.json north star


def _median(xs):
    return sorted(xs)[len(xs) // 2]


def _spread_pct(xs):
    med = _median(xs)
    return round((max(xs) - min(xs)) / med * 100, 1) if med else 0.0


def _disp(runs, digits=2):
    """Dispersion record for a k-repeated metric (review r4 weak #1: every
    published number was a single sample; on a tunneled single-core host
    that can't distinguish noise from regression round-over-round)."""
    return {"runs": [round(r, digits) for r in runs], "spread_pct": _spread_pct(runs)}


def _slope_rate(run, n_big):
    """Iterations/sec via a two-point slope. `run(n)` must return the wall
    time for n chained device iterations ending in ONE sync; the sync's
    tunnel round-trip is a CONSTANT per measurement, so
    (t_big - t_small)/(n_big - n_small) is the steady-state per-iteration
    time with the RTT cancelled exactly.

    Guarded: an RTT jitter spike during the small run can collapse the slope
    to ~0 or negative, which a bare division would publish as an absurd rate
    (review r4). The acceptance floor is scaled by the SYNC-CORRECTED
    per-iteration estimate — run(0) measures the constant sync round-trip
    directly, so the floor stays meaningful in --quick mode where the RTT
    dominates t_big/n_big (advisor r4: the old 0.2*t_big/n_big floor rejected
    legitimate slopes there, forcing the RTT-inflated fallback). The final
    fallback likewise subtracts the measured sync constant instead of
    publishing it inside the rate."""
    n_small = max(n_big // 3, 1)
    # min of two: a jitter spike can only INFLATE a sync sample, and an
    # inflated t_sync would overstate the fallback rate
    t_sync = min(run(0), run(0))
    t_big = None
    for _ in range(2):
        t_small, t_big = run(n_small), run(n_big)
        if n_big <= n_small:  # no slope exists at this frame budget
            break
        slope = (t_big - t_small) / (n_big - n_small)
        # legitimate slopes measure 60-95% of the sync-corrected estimate at
        # these frame counts. The 2%-of-t_big term keeps the floor positive
        # when the sync constant swallows t_big (so a pure-noise slope can
        # never publish an absurd rate: accepted rates are bounded by
        # 50 * n_big / t_big) without rejecting legitimate slopes in --quick
        # mode the way the old 0.2*t_big/n_big floor did (advisor r4).
        floor = (0.2 * max(t_big - t_sync, 0.0) + 0.02 * t_big) / n_big
        if slope > floor:
            return 1.0 / slope
    return n_big / max(t_big - t_sync, 0.2 * t_big)


def _time_stylize(stylizer, h, w, frames, batch=1, repeats=1):
    """Steady-state on-device throughput, k-repeated.

    Chains each frame's output into the next frame's input (same shape, valid
    [0,255] range) and syncs ONCE via a scalar value fetch. This defeats two
    tunnel-runtime artifacts: block_until_ready returning early, and
    per-frame host round-trips polluting the measurement.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32)
    reduce_fn = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    x = stylizer.stylize_batch(jax.device_put(img))
    x = stylizer.stylize_batch(x)  # warm both input signatures
    float(reduce_fn(x))  # compile + warmup, hard sync

    def run(n):
        nonlocal x
        t0 = time.perf_counter()
        for _ in range(n):
            x = stylizer.stylize_batch(x)  # chain device-resident frames
        float(reduce_fn(x))  # single sync
        return time.perf_counter() - t0

    return [batch * _slope_rate(run, frames) for _ in range(repeats)]


def bench_inference(frames, precision="bfloat16", repeats=3):
    import jax.numpy as jnp

    from faststyle_tpu.inference import Stylizer

    dtype = jnp.bfloat16 if precision == "bfloat16" else None
    stylizer = Stylizer(
        model_path=Path(__file__).parent / "weights" / "starry_final.npz",
        compute_dtype=dtype,
    )
    runs_1080 = _time_stylize(stylizer, 1080, 1920, frames, repeats=repeats)
    # small frames are fast (~1.4 ms): use enough of them that the single
    # sync round-trip (~100 ms on tunneled chips) stops dominating variance
    runs_512 = _time_stylize(stylizer, 512, 512, frames * 16, repeats=repeats)
    return runs_1080, runs_512


def _make_packed_fn(h, w):
    """The packed-u8 1080p-class serving program + resident params + one
    packed input frame: shared by the device-rate, e2e, latency, and MFU
    measurements so they all speak about the SAME compiled program."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from faststyle_tpu.inference import load_params, pack_u8_host
    from faststyle_tpu.models import transform_net

    params = jax.device_put(
        jax.tree.map(jnp.asarray, load_params(Path(__file__).parent / "weights" / "starry_final.npz"))
    )
    fn = jax.jit(
        lambda p, v: transform_net.apply_packed(
            p,
            v,
            compute_dtype=jnp.bfloat16,
            output_dtype=jnp.uint8,
            output_layout="packed_u8",
            input_layout="packed_u8",
            input_hw=(h, w),
        )
    )
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (1, h, w, 3), dtype=np.uint8)
    x = jax.device_put(pack_u8_host(img))
    return fn, params, x, img


def _program_flops(fn, *args):
    """FLOPs of a jitted program from XLA's own cost analysis — auditable
    against the stage ablations in docs/PERF.md (review r4 next #6). Returns
    None when the backend doesn't expose the counter."""
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def _peak_bf16_flops():
    """Dense bf16 peak of the attached chip from the public spec sheets.
    Returns (peak_flops_per_s, device_kind) or (None, kind) for unknown
    hardware — an MFU against a guessed peak would be worse than none."""
    import jax

    kind = jax.devices()[0].device_kind
    known = {
        "v4": 275e12,
        "v5 lite": 197e12,
        "v5e": 197e12,
        "v5p": 459e12,
        "v6 lite": 918e12,
        "v6e": 918e12,
    }
    k = kind.lower()
    for name, peak in known.items():
        if name in k:
            return peak, kind
    return None, kind


def bench_packed_io(frames=60, repeats=3):
    """Serving fast path: the host reflect-pads + packs uint8 frames and
    interleaves the packed-u8 output (native C++, overlapped with device
    compute via async dispatch); the device runs pure packed compute with
    NO boundary relayouts (docs/PERF.md). Reports device-side frame time
    (independent dispatches, single sync), the overlapping host pack+unpack
    cost, and the program's FLOPs/frame for the MFU computation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from faststyle_tpu.inference import unpack_u8_host

    fn, params, x, img = _make_packed_fn(1080, 1920)
    reduce_fn = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    out = fn(params, x)
    float(reduce_fn(out))
    flops = _program_flops(fn, params, x)

    def run(n):
        o = out
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(params, x)
        float(reduce_fn(o))
        return time.perf_counter() - t0

    # two-point slope cancels the constant sync round-trip (see _slope_rate)
    device_fps_runs = [_slope_rate(run, frames) for _ in range(repeats)]
    raw = np.asarray(out)
    from faststyle_tpu.inference import pack_u8_host

    for _ in range(3):  # warm the page cache / thread pool before timing
        pack_u8_host(img)
        unpack_u8_host(raw, 1080, 1920)
    host_runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(10):
            pack_u8_host(img)
            unpack_u8_host(raw, 1080, 1920)
        host_runs.append((time.perf_counter() - t0) / 10 * 1e3)
    return device_fps_runs, host_runs, flops


def calibrate_host(repeats=5):
    """Single-core host calibration, re-measured every run so drift in the
    host-bound metrics (pack/unpack ms, slow-style host overhead) is
    attributable to the machine rather than the code (review r4 weak #1:
    +34% host-pack drift r3->r4 with no code change was unexplainable from
    the artifact alone)."""
    import numpy as np

    from faststyle_tpu import inference

    img = np.random.default_rng(0).integers(0, 256, (1, 1080, 1920, 3), dtype=np.uint8)
    old = inference._MIN_ROWS_PER_SLAB
    inference._MIN_ROWS_PER_SLAB = 10**9  # force single-slab: exactly one core
    try:
        packed = inference.pack_u8_host(img)  # warm
        inference.unpack_u8_host(packed, 1080, 1920)
        pack_ms, unpack_ms = [], []
        for _ in range(repeats):
            t0 = time.perf_counter()
            inference.pack_u8_host(img)
            pack_ms.append((time.perf_counter() - t0) * 1e3)
            t0 = time.perf_counter()
            inference.unpack_u8_host(packed, 1080, 1920)
            unpack_ms.append((time.perf_counter() - t0) * 1e3)
    finally:
        inference._MIN_ROWS_PER_SLAB = old
    return {
        "pack_1080p_1core_ms": round(_median(pack_ms), 2),
        "unpack_1080p_1core_ms": round(_median(unpack_ms), 2),
        "cpu_count": os.cpu_count(),
    }


def calibrate_chip(windows=4, n=4096, iters=30):
    """Raw bf16 matmul throughput of the attached chip, re-measured every
    run. The shared axon tunnel has been observed to deliver the SAME
    compiled programs 20-25x slower for whole multi-minute windows
    (2026-08-20: 5.4 fps @1080p in one process, 132 fps minutes later, with
    a 4096^2 matmul at 13 vs 104 TFLOP/s bracketing it) — a bench artifact
    from such a window is meaningless unless it carries its own chip-health
    reading. Reports the best window (back-to-back chains of a compiled
    matmul, single sync each) and the fraction of the spec-sheet bf16 peak;
    `degraded` flags a run whose numbers should not be compared round-over-
    round."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a, b: a @ b)
    a = jnp.ones((n, n), jnp.bfloat16)
    red = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    float(red(f(a, a)))  # compile + warm
    best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        o = a
        for _ in range(iters):
            o = f(o, a)
        float(red(o))
        best = max(best, iters * 2 * n**3 / (time.perf_counter() - t0))
    peak, _kind = _peak_bf16_flops()
    out = {"matmul_bf16_tflops": round(best / 1e12, 1)}
    if peak:
        frac = best / peak
        out["matmul_frac_of_peak"] = round(frac, 3)
        # 104/197 = 0.53 is the healthy reading for this 4096^2 chain on
        # v5e; anything under half of that means the window is throttled
        out["degraded"] = frac < 0.25
    return out


def measure_io_link(h=1080, w=1920):
    """Characterize the host<->device link so the e2e serving figures are
    interpretable: round-trip latency (scalar fetch), one-frame H2D/D2H
    transfer times, AND pipelined (overlapped, many-in-flight) per-frame
    transfer times — the e2e loop keeps several frames in flight, so its
    ceiling comes from the PIPELINED figures, not the single-frame ones
    (review r4 weak #2: the single-frame medians put the published ceiling
    below the measured loop). On a real TPU VM these are PCIe (~negligible
    per frame); under this sandbox's tunneled runtime they are network-bound
    and set a hard ceiling on any per-frame-I/O serving loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    # RTT: tiny payload round trip, median of 5
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(jax.device_put(np.float32(1.0))))
        rtts.append(time.perf_counter() - t0)
    # All syncs below go through a scalar VALUE fetch, never
    # block_until_ready — this runtime's block_until_ready can return early
    # (the same artifact _time_stylize defeats), which would report h2d near
    # zero and then corrupt the d2h window with leftover transfer time.
    red = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    # distinct source frames so device_put can never hand back a cached
    # buffer for an already-transferred host array
    n_pipe = 6
    frames = [rng.integers(0, 256, (1, h, w, 3), dtype=np.uint8) for _ in range(n_pipe)]
    resident = jax.device_put(frames[0])
    float(red(resident))  # compile + warm
    t_red = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(red(resident))
        t_red.append(time.perf_counter() - t0)
    red_s = sorted(t_red)[1]  # reduce+scalar-fetch on a resident array
    h2d = []
    for i in range(4):
        t0 = time.perf_counter()
        dev = jax.device_put(frames[i % 2])
        float(red(dev))  # value-fetch sync; its own cost is red_s, subtracted
        h2d.append(max(time.perf_counter() - t0 - red_s, 0.0))
    # D2H: time the FIRST fetch of a fresh device-produced array each
    # iteration — jax.Array caches the host copy after one np.asarray, so
    # reusing one array measures a cache hit, not the link. bump(resident, i)
    # with a varying addend guarantees a fresh, already-resident result whose
    # completion is pinned by the value fetch before the clock starts.
    bump = jax.jit(lambda x, k: x + k)  # stays uint8 (weak-typed scalar)
    d2h = []
    for i in range(3):
        dev = bump(resident, np.uint8(i + 1))
        float(red(dev))  # ensure computed + resident before timing the fetch
        t0 = time.perf_counter()
        np.asarray(dev)
        d2h.append(time.perf_counter() - t0)
    # PIPELINED H2D: dispatch n_pipe distinct puts back-to-back, sync once.
    # Per-frame time here reflects whatever overlap the link actually gives
    # many-in-flight transfers — the regime the e2e loop runs in.
    t0 = time.perf_counter()
    devs = [jax.device_put(f) for f in frames]
    for d in devs:
        float(red(d))
    h2d_pipe = max((time.perf_counter() - t0) / n_pipe - red_s, 1e-6)
    # PIPELINED D2H: start all copies early (copy_to_host_async), then drain.
    outs = [bump(resident, np.uint8(i + 10)) for i in range(n_pipe)]
    for o in outs:
        float(red(o))  # all computed + resident before the clock starts
    t0 = time.perf_counter()
    for o in outs:
        try:
            o.copy_to_host_async()
        except Exception:
            pass
    for o in outs:
        np.asarray(o)
    d2h_pipe = (time.perf_counter() - t0) / n_pipe
    ms = lambda xs: round(sorted(xs)[len(xs) // 2] * 1000, 1)  # noqa: E731
    return {
        "rtt_ms": ms(rtts),
        "h2d_frame_ms": ms(h2d),
        "d2h_frame_ms": ms(d2h),
        "h2d_frame_ms_pipelined": round(h2d_pipe * 1000, 1),
        "d2h_frame_ms_pipelined": round(d2h_pipe * 1000, 1),
    }


def bench_packed_io_e2e(frames=60, h=1080, w=1920, depth=4):
    """END-TO-END pipelined packed-u8 serving (VERDICT r3 weak #2): a real
    overlapped loop, measured instead of asserted. Keeps `depth` frames in
    flight — dispatch frame N, then host-pack N+1 and host-unpack N-depth
    while the device runs — the standard serving design for an accelerator
    behind a link with latency: throughput degrades to the slowest STAGE
    (max of host pack, H2D, compute, D2H, unpack), not the sum of latencies.

    Reported fps includes EVERYTHING: host pack (native C++), H2D transfer,
    device compute, D2H transfer (started early via copy_to_host_async), and
    host depth-to-space unpack. Also reports per-frame INDUCED latency
    (submit -> unpack complete, p50/p99): pipelining buys throughput by
    holding `depth` frames in flight, so each frame waits ~depth periods —
    the latency/throughput trade a serving deployment must pick (review r4
    next #1). On this sandbox the numbers are bounded by the tunneled
    host<->device link (see measure_io_link in the bench details) — on a
    real TPU VM (PCIe, many-core host) the same loop converges to the
    device-side rate."""
    import jax
    import numpy as np
    from collections import deque

    from faststyle_tpu.inference import pack_u8_host, unpack_u8_host

    fn, params, x0, _ = _make_packed_fn(h, w)
    rng = np.random.default_rng(0)
    # two distinct source frames alternate so every iteration pays a REAL
    # host pack + H2D (a single cached frame would overstate the pipeline)
    srcs = [rng.integers(0, 256, (1, h, w, 3), dtype=np.uint8) for _ in range(2)]
    out = fn(params, x0)
    np.asarray(out).sum()  # compile + full warmup incl. D2H

    lat = [0.0] * frames
    t0 = time.perf_counter()
    inflight = deque()
    for i in range(frames):
        t_submit = time.perf_counter()
        x = jax.device_put(pack_u8_host(srcs[i % 2]))  # host pack + H2D
        cur = fn(params, x)  # dispatch (async)
        try:
            cur.copy_to_host_async()  # start D2H behind the compute
        except Exception:
            pass
        inflight.append((i, t_submit, cur))
        if len(inflight) > depth:
            # fetch + unpack the OLDEST frame — its compute and (started)
            # D2H have had `depth` frames of time to complete
            j, ts, arr = inflight.popleft()
            unpack_u8_host(np.asarray(arr), h, w)
            lat[j] = time.perf_counter() - ts
    while inflight:
        j, ts, arr = inflight.popleft()
        unpack_u8_host(np.asarray(arr), h, w)
        lat[j] = time.perf_counter() - ts
    fps = round(frames / (time.perf_counter() - t0), 2)
    lat_ms = sorted(v * 1e3 for v in lat)
    p50 = lat_ms[len(lat_ms) // 2]
    p99 = lat_ms[min(len(lat_ms) - 1, int(0.99 * len(lat_ms)))]
    return fps, round(p50, 1), round(p99, 1)


def bench_latency_sync(h, w, frames=30):
    """Per-frame latency of the SYNCHRONOUS depth-1 serving loop — the
    reference webcam's actual shape (/root/reference/stylize_webcam.py:80-103
    is one blocking sess.run per frame): host pack -> H2D -> device compute
    -> D2H -> host unpack, one frame fully completing before the next starts.
    This is the latency-bound figure BASELINE config #2 calls for (review r4
    missing #1). Reports p50/p99 ms over `frames` frames, plus the device
    compute component alone (slope-derived, sync-free) — on this sandbox the
    gap between them IS the tunneled link; on a local-PCIe TPU VM sync
    latency converges to device_ms + ~1 ms of PCIe."""
    import jax
    import numpy as np

    from faststyle_tpu.inference import pack_u8_host, unpack_u8_host
    from faststyle_tpu.models import transform_net

    fn, params, x0, _ = _make_packed_fn(h, w)
    oh, ow = transform_net.output_shape(h, w)
    rng = np.random.default_rng(0)
    srcs = [rng.integers(0, 256, (1, h, w, 3), dtype=np.uint8) for _ in range(2)]
    out = fn(params, x0)
    np.asarray(out).sum()  # compile + warm the full path incl. D2H

    # device compute component, sync-corrected (same method as the
    # throughput benches: chain dispatches, one value-fetch sync)
    import jax.numpy as jnp

    red = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    float(red(out))

    def run(n):
        o = out
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(params, x0)
        float(red(o))
        return time.perf_counter() - t0

    device_ms = 1e3 / _slope_rate(run, max(frames, 10))

    lat = []
    for i in range(frames):
        t0 = time.perf_counter()
        x = jax.device_put(pack_u8_host(srcs[i % 2]))
        y = fn(params, x)
        unpack_u8_host(np.asarray(y), oh, ow)  # blocking fetch + interleave
        lat.append((time.perf_counter() - t0) * 1e3)
    lat.sort()
    p50 = lat[len(lat) // 2]
    p99 = lat[min(len(lat) - 1, int(0.99 * len(lat)))]
    return round(p50, 1), round(p99, 1), round(device_ms, 2)


def run_tpu_gate(timeout=900):
    """Execute the on-TPU correctness gate (tpu_tests/) in a subprocess and
    summarize for the bench JSON (VERDICT r3 missing #3: a bf16-on-TPU
    numerics bug must not be able to hide behind CPU-only CI).

    Returns (status, detail) where status is one of:
      "pass"    — at least one gate test executed and all executed ones passed
      "FAIL"    — pytest reported test failures (rc==1): the build is
                  numerically wrong and main() must NOT publish a bench number
      "skipped" — the gate ran but asserted nothing (all tests skipped, e.g.
                  jax platform isn't tpu) — explicitly not a pass
      "ERROR"   — environmental trouble (timeout, pytest internal error):
                  the gate could not run; doesn't sink the bench itself
    """
    import subprocess

    cmd = [
        sys.executable, "-m", "pytest",
        str(Path(__file__).resolve().parent / "tpu_tests"), "-q", "--no-header",
    ]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
        tail = [
            ln for ln in out.stdout.strip().splitlines()
            if " passed" in ln or " failed" in ln or " error" in ln or " skipped" in ln
        ]
        summary = tail[-1].strip("= ") if tail else out.stdout.strip()[-120:]
        if out.returncode == 0:
            # rc 0 with zero "passed" means every test skipped — vacuous
            status = "pass" if " passed" in f" {summary}" else "skipped"
        elif out.returncode == 1:
            status = "FAIL"
        elif out.returncode == 5:
            # rc 5 = pytest collected NOTHING: a rename/emptying of
            # tpu_tests/ must read as a vacuous gate, not environmental
            # trouble (review r4)
            status = "skipped"
            summary = f"no tests collected — {summary}"
        else:  # 2/3/4: interrupted / internal error / usage error
            status = "ERROR"
        return status, f"{status} ({summary})"
    except Exception as e:  # never let the gate sink the metric itself
        return "ERROR", f"ERROR ({type(e).__name__}: {e})"


def gate_with_recovery(slice_secs, budget_left, retry_secs=300, min_budget=1200):
    """Gate once; if the slice was eaten by a timeout, retry once bounded.

    Observed failure shape (2026-08-20 rehearsal): the tunnel hangs at jax
    init inside the gate subprocess and consumes the full 45% slice, then
    recovers — a retry on the recovered tunnel passes the (warm, jitted)
    gate in ~80 s. The retry only runs if `budget_left()` (seconds of
    watchdog budget remaining) still leaves room for the benches."""
    status, detail = run_tpu_gate(slice_secs)
    if status == "ERROR" and "TimeoutExpired" in detail and budget_left() > min_budget:
        status, retry_detail = run_tpu_gate(retry_secs)
        detail = f"{retry_detail} (after a timed-out first attempt)"
    return status, detail


def bench_train_step(steps=20, precision="float32", fused_content_tower=False, repeats=3):
    """Train step/sec at the reference recipe shapes (batch 4 @ 256px),
    synthetic data, random VGG (weights don't change the math's cost).
    Repeats time k back-to-back windows on the SAME compiled step (compile
    once, measure k times). Returns (rate_runs, flops_per_step).
    `fused_content_tower` measures the default-off knob (docs/PERF.md) with
    the same harness — tools/measure_fused_tower.py calls this."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from faststyle_tpu.models import vgg16
    from faststyle_tpu.training import slow_style
    from faststyle_tpu.training.train_step import (
        TrainConfig,
        init_state,
        make_jitted_train_step,
    )

    config = TrainConfig.make(
        compute_dtype=jnp.bfloat16 if precision == "bfloat16" else None
    )
    vgg_params = vgg16.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    style = rng.uniform(0, 255, (1, 256, 256, 3)).astype(np.float32)
    grams = slow_style.style_target_grams(
        vgg_params, style, tuple(dict(config.style_weights))
    )
    step_fn = make_jitted_train_step(
        vgg_params, grams, config, fused_content_tower=fused_content_tower
    )
    state = init_state(jax.random.PRNGKey(1), config)
    # device-resident batch: real training overlaps host->device transfer via
    # data.pipeline.device_prefetch, so the step-rate metric excludes it
    batch = jax.device_put(rng.uniform(0, 255, (4, 256, 256, 3)).astype(np.float32))
    state, m = step_fn(state, batch)
    float(m["loss"])  # compile + hard sync (block_until_ready can lie on tunnels)
    flops = _program_flops(step_fn, state, batch)
    runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step_fn(state, batch)  # state dependency chains the steps
        float(m["loss"])  # single sync
        runs.append(steps / (time.perf_counter() - t0))
    return runs, flops


def bench_slow_style(steps=100, precision="float32"):
    """Gatys pixel-optimization steps/sec at 256px (BASELINE config #2 —
    wall time for the 1000-step loop extrapolates as 1000/rate). Random VGG
    weights: identical compute cost to pretrained. Returns the per-chunk
    rates (each chunk is an independent window of the same compiled loop),
    so the artifact carries dispersion, not a single sample."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from faststyle_tpu.models import vgg16
    from faststyle_tpu.training import slow_style

    vgg_params = vgg16.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    content = rng.uniform(0, 255, (256, 256, 3)).astype(np.float32)
    style = rng.uniform(0, 255, (1, 256, 256, 3)).astype(np.float32)
    weights = dict(
        content_weights={"conv3_3": 1.0},
        style_weights={"conv1_2": 5.0, "conv2_2": 5.0, "conv3_3": 5.0, "conv4_3": 5.0},
        compute_dtype=jnp.bfloat16 if precision == "bfloat16" else None,
    )
    # steady-state rate from per-chunk log timestamps, skipping the first
    # chunk (it pays trace+compile); log_fn's loss fetch syncs each chunk
    stamps = []
    chunk = 10
    slow_style.optimize(
        vgg_params, content, style,
        num_steps=steps + chunk, log_every=chunk,
        log_fn=lambda step, loss: stamps.append((step, time.perf_counter())),
        **weights,
    )
    rates = [
        (s1 - s0) / (t1 - t0)
        for (s0, t0), (s1, t1) in zip(stamps[1:], stamps[2:])
    ]
    return rates


def bench_dp_scaling(steps=10):
    """Per-chip train-step time at 1/2/4/8-way data-parallel sharding
    (BASELINE config #5's "measure & record scaling"). Weak scaling: the
    per-chip batch is fixed, so ideal efficiency keeps the step time flat
    while global batch grows with the mesh.

    Runs on the real device set when >1 accelerators are attached; with a
    single chip (this environment) it falls back to an 8-virtual-device CPU
    mesh — that measures the collective/sharding machinery, not ICI, and is
    labeled as such in the output.
    """
    import jax

    if os.environ.get("_FASTSTYLE_DP_CPU"):
        # re-exec'd child: env vars alone don't override a pinned TPU plugin;
        # the jax.config platform override must land before backend init
        # (the dryrun/conftest recipe)
        jax.config.update("jax_platforms", "cpu")
    if jax.device_count() < 2:
        # single chip: re-exec with the platform forced to an 8-virtual-device
        # CPU mesh (the plugin pins the platform once jax initializes, so a
        # fresh process is the only way to switch)
        if os.environ.get("_FASTSTYLE_DP_CPU"):
            raise SystemExit("dp scaling: CPU re-exec still sees <2 devices")
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
        os.environ["_FASTSTYLE_DP_CPU"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)
    import numpy as np
    from jax.sharding import Mesh

    from faststyle_tpu.models import vgg16
    from faststyle_tpu.parallel.data_parallel import make_dp_train_step
    from faststyle_tpu.parallel.mesh import DATA_AXIS, batch_sharding
    from faststyle_tpu.training import slow_style
    from faststyle_tpu.training.train_step import TrainConfig, init_state

    from faststyle_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    config = TrainConfig.make()
    vgg_params = vgg16.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    style = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    grams = slow_style.style_target_grams(vgg_params, style, tuple(dict(config.style_weights)))

    per_chip_batch, size = 2, 64
    results = {}
    sizes = [n for n in (1, 2, 4, 8) if n <= jax.device_count()]
    for n in sizes:
        mesh = Mesh(np.asarray(jax.devices()[:n]), (DATA_AXIS,))
        step_fn = make_dp_train_step(vgg_params, grams, config, mesh)
        state = init_state(jax.random.PRNGKey(1), config)
        batch = rng.uniform(0, 255, (per_chip_batch * n, size, size, 3)).astype(np.float32)
        batch = jax.device_put(batch, batch_sharding(mesh))
        state, m = step_fn(state, batch)
        float(m["loss"])  # compile + hard sync
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step_fn(state, batch)
        float(m["loss"])
        results[f"{n}way_ms_per_step"] = round(1e3 * (time.perf_counter() - t0) / steps, 2)
    base = results[f"{sizes[0]}way_ms_per_step"]
    top = sizes[-1]
    on_tpu = jax.devices()[0].platform == "tpu"
    results["mesh"] = f"{top}x {jax.devices()[0].platform}"
    results["per_chip_batch"] = per_chip_batch
    if on_tpu:
        # real chips: ideal weak scaling keeps step time flat
        results["weak_scaling_efficiency"] = round(
            base / results[f"{top}way_ms_per_step"], 3
        )
        results["note"] = "real ICI"
    else:
        # Virtual CPU devices timeshare the host cores AND share XLA's
        # intra-op thread pool, so n-way vs 1-way step time measures host
        # oversubscription, not sharding overhead — no defensible efficiency
        # scalar exists here (round 2 published a "normalized" one that came
        # out >1.0; see VERDICT r2). The block validates that the sharded
        # step compiles and runs at every mesh width; per-n times are left
        # for reference only.
        results["correctness_only"] = True
        results["note"] = (
            f"virtual CPU mesh on {os.cpu_count()} host cores: validates "
            "collective/sharding machinery; step times reflect host core "
            "timesharing, so no efficiency scalar is reported (needs >1 "
            "real chips)"
        )
    return results


def _dp_subprocess(quick, timeout=1800):
    """Run `bench.py --dp` in a fresh process (the CPU-mesh fallback must
    force the platform before jax initializes, impossible in-process after
    the TPU benchmarks ran). `timeout` is whatever slice of the watchdog
    budget remains — the caller shrinks it so gate + benches + dp can never
    jointly overrun the watchdog (review r4)."""
    import subprocess

    cmd = [sys.executable, str(Path(__file__).resolve()), "--dp"]
    if quick:
        cmd.append("--quick")
    out = None
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
        return json.loads(out.stdout.strip().splitlines()[-1])["details"]
    except Exception as e:  # never let the scaling probe sink the headline metric
        err = {"error": f"{type(e).__name__}: {e}"}
        stderr = getattr(e, "stderr", None) or (out.stderr if out else "")
        if stderr:
            err["stderr_tail"] = stderr[-500:]
        return err


def _start_watchdog(seconds: float):
    """Print an honest failure JSON line and hard-exit if the run wedges.

    The axon tunnel can go down for hours (observed 2026-08-17), in which
    state even jax.devices() blocks forever — a benchmark that hangs
    silently records nothing; one that times out records WHY."""
    import threading

    def fire():
        print(
            json.dumps(
                {
                    "metric": "1080p_stylize_fps_per_chip",
                    "value": 0,
                    "unit": "frames/sec",
                    "vs_baseline": 0,
                    "details": {
                        "error": f"watchdog: no result within {seconds:.0f}s "
                        "(TPU tunnel unreachable or compile wedged)"
                    },
                }
            ),
            flush=True,
        )
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_dp", action="store_true")
    parser.add_argument("--skip_tpu_tests", action="store_true")
    parser.add_argument("--dp", action="store_true", help="DP-scaling measurement only")
    parser.add_argument("--precision", default="bfloat16", choices=["bfloat16", "float32"])
    parser.add_argument(
        "--watchdog_secs", type=float, default=3300.0,
        help="hard deadline for the whole run (0 disables); on expiry prints "
        "a zero-valued metric with the reason and exits 3",
    )
    args = parser.parse_args()
    t_start = time.perf_counter()
    watchdog = _start_watchdog(args.watchdog_secs) if args.watchdog_secs > 0 else None

    if args.dp:
        res = bench_dp_scaling(5 if args.quick else 10)
        if "weak_scaling_efficiency" in res:  # real multi-chip mesh
            eff = res["weak_scaling_efficiency"]
            print(
                json.dumps(
                    {
                        "metric": "dp_weak_scaling_efficiency",
                        "value": eff,
                        "unit": "x (1.0 = ideal)",
                        "vs_baseline": eff,
                        "details": res,
                    }
                )
            )
        else:  # CPU-mesh fallback: correctness signal only
            print(
                json.dumps(
                    {
                        "metric": "dp_sharding_correctness",
                        "value": 1,
                        "unit": "ok (ran 1/2/4/8-way; no efficiency on a virtual mesh)",
                        "vs_baseline": 1,
                        "details": res,
                    }
                )
            )
        if watchdog is not None:
            watchdog.cancel()
        return

    from faststyle_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    details = {}
    dispersion = {}
    if not args.skip_tpu_tests:
        # the on-chip correctness gate runs FIRST: a bench number from a
        # numerically-wrong build is worse than no number. Its timeout is a
        # bounded slice of the watchdog budget so a slow cold-cache compile
        # can't starve the benches themselves (review r4).
        budget = args.watchdog_secs if args.watchdog_secs > 0 else 3300.0
        # measured: warm-cache gate ≈ 81 s since the round-5 whole-program
        # jit refactor (was ~700 s eager; cold compiles or a tunnel hang can
        # still consume the slice) — cap the gate at 45% of the watchdog
        # budget; if it eats that, the degrade-to-quick guard below keeps
        # the benches publishable
        gate_status, gate_detail = gate_with_recovery(
            300 if args.quick else min(1500, int(budget * 0.45)),
            lambda: args.watchdog_secs - (time.perf_counter() - t_start),
        )
        details["tpu_tests"] = gate_detail
        if gate_status == "FAIL":
            # the gate gates: publish an honest zero, not a number measured
            # on a numerically-wrong build
            print(
                json.dumps(
                    {
                        "metric": "1080p_stylize_fps_per_chip",
                        "value": 0,
                        "unit": "frames/sec",
                        "vs_baseline": 0,
                        "details": details,
                    }
                )
            )
            if watchdog is not None:
                watchdog.cancel()
            sys.exit(3)

    if not args.quick and args.watchdog_secs > 0:
        # a tunnel hang inside the gate (observed: pytest subprocess blocked
        # to its full 45% slice) can leave too little watchdog budget for
        # the full-size benches — then the watchdog kills a half-done run
        # and the artifact is a zero. Degrade to quick-mode sizes instead:
        # every metric still publishes, with the downgrade recorded. The
        # full benches need ~1500 s warm on this tunnel; quick needs ~800.
        remaining_budget = args.watchdog_secs - (time.perf_counter() - t_start)
        if remaining_budget < 1800:
            args.quick = True
            details["degraded_to_quick"] = (
                f"only {remaining_budget:.0f}s of watchdog budget left after "
                "the gate — measuring at --quick sizes so the artifact "
                "completes instead of dying at the watchdog"
            )
            print(f"[bench] {details['degraded_to_quick']}", file=sys.stderr, flush=True)

    import jax as _jax

    if _jax.devices()[0].platform != "cpu":
        # chip health BEFORE any measurement: the shared tunnel delivers
        # whole 20-25x-slow windows (see calibrate_chip). If the window is
        # degraded, wait it out (bounded; the watchdog still rules) rather
        # than publish numbers that can't be compared round-over-round.
        cal = calibrate_chip()
        waited = 0
        while cal.get("degraded") and waited < 3:
            print(
                f"[bench] chip degraded ({cal['matmul_bf16_tflops']} TFLOP/s, "
                f"{cal.get('matmul_frac_of_peak', 0):.0%} of peak) — waiting 60s",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(60)
            waited += 1
            cal = calibrate_chip()
        cal["degraded_waits"] = waited
        details["chip_calibration"] = cal

    frames = 10 if args.quick else 60
    repeats = 3 if args.quick else 5
    runs_1080, runs_512 = bench_inference(frames, args.precision, repeats)
    fps_1080 = _median(runs_1080)
    details["stylize_512px_fps"] = round(_median(runs_512), 2)
    details["precision"] = args.precision
    dispersion["1080p_fps"] = _disp(runs_1080)
    dispersion["512px_fps"] = _disp(runs_512)
    details["host_calibration"] = calibrate_host()
    if args.precision == "bfloat16":
        dev_runs, host_runs, serve_flops = bench_packed_io(frames, repeats)
        dev_fps = _median(dev_runs)
        details["stylize_1080p_fps_packed_io_serving"] = round(dev_fps, 2)
        details["packed_io_host_ms_per_frame"] = round(_median(host_runs), 2)
        dispersion["packed_io_device_fps"] = _disp(dev_runs)
        dispersion["packed_io_host_ms"] = _disp(host_runs)
        peak, kind = _peak_bf16_flops()
        if serve_flops:
            details["model_flops_per_frame_1080p"] = serve_flops
            achieved = serve_flops * dev_fps
            details["serving_tflops_per_s"] = round(achieved / 1e12, 2)
            if peak:
                # MFU vs the chip's dense-bf16 peak, from XLA's own FLOP
                # count of the serving program (review r4 next #6)
                details["serving_mfu"] = round(achieved / peak, 4)
        details["device_kind"] = kind
        if peak:
            details["peak_bf16_tflops"] = round(peak / 1e12, 1)
        link = measure_io_link()
        details["io_link"] = link
        e2e_fps, pipe_p50, pipe_p99 = bench_packed_io_e2e(frames)
        details["stylize_1080p_fps_packed_io_e2e"] = e2e_fps
        details["stream_1080p_pipelined_latency_ms_p50"] = pipe_p50
        details["stream_1080p_pipelined_latency_ms_p99"] = pipe_p99
        fps_4k, _, _ = bench_packed_io_e2e(max(frames // 3, 5), 2160, 3840)
        details["stylize_4k_fps_packed_io_e2e"] = fps_4k
        # synchronous depth-1 per-frame latency (BASELINE config #2's own
        # figure of merit, review r4 missing #1) at the webcam and 1080p
        # shapes; device_ms is the compute component a local-PCIe host sees
        lat_frames = 10 if args.quick else 30
        p50, p99, dev_ms = bench_latency_sync(600, 800, lat_frames)
        details["stream_800x600_latency_ms_p50"] = p50
        details["stream_800x600_latency_ms_p99"] = p99
        details["stream_800x600_device_ms_per_frame"] = dev_ms
        p50, p99, dev_ms = bench_latency_sync(1080, 1920, lat_frames)
        details["stream_1080p_latency_ms_p50"] = p50
        details["stream_1080p_latency_ms_p99"] = p99
        details["stream_1080p_device_ms_per_frame"] = dev_ms
        if link["rtt_ms"] > 5.0:  # network-tunneled device, not local PCIe
            # the depth-pipelined loop's ceiling is the slowest STAGE. Derive
            # the bounds from the PIPELINED link figures (same overlapped
            # regime as the loop itself) and always print measured-vs-bound:
            # the artifact must never state a ceiling below its own
            # measurement (review r4 weak #2 — the single-frame medians did).
            h2d_p, d2h_p = link["h2d_frame_ms_pipelined"], link["d2h_frame_ms_pipelined"]
            hi = 1000.0 / max(max(h2d_p, d2h_p), 1e-9)
            lo = 1000.0 / max(h2d_p + d2h_p, 1e-9)
            consistency = (
                "measured within bounds"
                if lo - 0.05 <= e2e_fps <= hi + 0.05
                else f"measured {'above' if e2e_fps > hi else 'below'} the "
                "link-derived bound — link jitter between the two windows"
            )
            details["e2e_note"] = (
                f"host<->device link is tunneled (rtt {link['rtt_ms']} ms; "
                f"pipelined {h2d_p:.0f}/{d2h_p:.0f} ms per 1080p frame "
                f"up/down): the e2e loop is link-bound between ~{lo:.1f} fps "
                f"(transfers serialized) and ~{hi:.1f} fps (full duplex); "
                f"measured {e2e_fps} fps — {consistency}. Sync depth-1 "
                "latency is likewise link-dominated here; on a local-PCIe "
                "TPU VM the loop converges to "
                "stylize_1080p_fps_packed_io_serving and sync latency to "
                "stream_*_device_ms_per_frame"
            )
    if not args.skip_train:
        train_runs, train_flops = bench_train_step(
            20 if args.quick else 50, args.precision, repeats=2 if args.quick else 3
        )
        train_rate = _median(train_runs)
        details["train_steps_per_sec_b4_256"] = round(train_rate, 3)
        dispersion["train_steps_per_sec"] = _disp(train_runs, 3)
        if train_flops:
            details["train_flops_per_step_b4_256"] = train_flops
            peak, _kind = _peak_bf16_flops()
            achieved = train_flops * train_rate
            details["train_tflops_per_s"] = round(achieved / 1e12, 2)
            if peak and args.precision == "bfloat16":
                details["train_mfu"] = round(achieved / peak, 4)
        ss_rates = bench_slow_style(20 if args.quick else 100, args.precision)
        rate = _median(ss_rates)
        details["slow_style_steps_per_sec_256"] = round(rate, 2)
        details["slow_style_1000step_seconds"] = round(1000 / rate, 1)
        dispersion["slow_style_steps_per_sec"] = _disp(ss_rates)
    details["dispersion"] = dispersion
    if not args.skip_dp:
        # hand dp only what's left of the watchdog budget (minus a margin for
        # JSON assembly) so gate + benches + dp can never jointly overrun it
        budget = args.watchdog_secs if args.watchdog_secs > 0 else 3300.0
        remaining = budget - (time.perf_counter() - t_start)
        details["dp_scaling"] = _dp_subprocess(
            args.quick, timeout=max(60, min(1800, remaining - 120))
        )

    print(
        json.dumps(
            {
                "metric": "1080p_stylize_fps_per_chip",
                "value": round(fps_1080, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps_1080 / TARGET_FPS_1080P, 3),
                "details": details,
            }
        )
    )
    if watchdog is not None:
        watchdog.cancel()


if __name__ == "__main__":
    main()
