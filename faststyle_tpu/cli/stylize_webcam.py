#!/usr/bin/env python3
"""Streaming stylization: webcam, video file, or synthetic frames.

Covers the reference's webcam filter (`/root/reference/stylize_webcam.py`)
with the same core flags (--model_path, --upsample_method, --resolution) and
behavior (fixed-shape compile at capture resolution, output.avi writer,
'q' to quit), plus sources usable headlessly: --video_path (any video file)
and --num_synthetic_frames (generated frames, for latency benchmarking/CI).

RGB contract note: the reference feeds the BGR frame to the net un-converted
and converts the OUTPUT BGR->RGB (stylize_webcam.py:82-90, a known TODO in
the reference). This implementation converts the input to RGB before the net
and back to BGR for display/writing — the correct contract; the visual
difference on the reference's own models is a channel swap of the input.

Pipelining: dispatch frame N's computation, then fetch frame N-1's result —
JAX's async dispatch overlaps TPU compute with host capture/encode.
"""

import argparse
import time



def setup_parser():
    parser = argparse.ArgumentParser(
        description="Use a trained fast style transfer model to filter a video stream."
    )
    parser.add_argument(
        "--model_path",
        default="./models/starry_final.ckpt",
        help="Path to .ckpt (TF1) or .npz (native) for the trained model.",
    )
    parser.add_argument(
        "--upsample_method", choices=["resize", "deconv"], default="resize"
    )
    parser.add_argument(
        "--resolution",
        nargs=2,
        type=int,
        default=None,
        help="Dimensions (width height) for webcam capture.",
    )
    # --- sources beyond the webcam ---
    parser.add_argument("--video_path", default=None, help="Stylize a video file instead of the webcam.")
    parser.add_argument(
        "--num_synthetic_frames",
        type=int,
        default=0,
        help="Stylize N generated frames (no camera/file needed; prints fps).",
    )
    parser.add_argument("--output_path", default="output.avi")
    parser.add_argument("--no_display", action="store_true", help="Headless: skip cv2.imshow.")
    parser.add_argument("--precision", choices=["float32", "bfloat16"], default="bfloat16")
    parser.add_argument("--max_frames", type=int, default=-1)
    parser.add_argument(
        "--packed_fetch",
        action="store_true",
        help="Fetch frames in the device's packed-u8 layout and interleave "
        "on the host (native C++ depth-to-space, overlapped with the next "
        "frame's dispatch) — skips the device-side output relayout, the "
        "largest remaining per-frame cost (docs/PERF.md).",
    )
    parser.add_argument(
        "--pipeline_depth",
        type=int,
        default=1,
        help="Frames kept in flight on the device. 1 (default) dispatches "
        "frame N then fetches N-1 — throughput without an extra frame of "
        "induced latency. Higher depths raise throughput toward the "
        "slowest-stage rate at ~depth x the stage period of per-frame "
        "latency (docs/SERVING.md 'Latency vs throughput'). Interactive "
        "use wants <=2; offline video transcodes want more.",
    )
    parser.add_argument(
        "--report_latency",
        action="store_true",
        help="Print per-frame induced latency (capture->emit, p50/p99) at "
        "the end of the stream alongside the fps line.",
    )
    return parser


def _latency_line(lat_s):
    lat = sorted(v * 1e3 for v in lat_s)
    p50 = lat[len(lat) // 2]
    p99 = lat[min(len(lat) - 1, int(0.99 * len(lat)))]
    return f"per-frame latency p50 {p50:.1f} ms / p99 {p99:.1f} ms"


def synthetic_frames(n, h, w):
    import numpy as np

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)  # cameras produce uint8
    for i in range(n):
        yield np.roll(base, i * 4, axis=1)


def main():
    args = setup_parser().parse_args()

    import jax.numpy as jnp
    import numpy as np

    from faststyle_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from faststyle_tpu.inference import Stylizer

    stylizer = Stylizer(
        model_path=args.model_path,
        upsample_method=args.upsample_method,
        compute_dtype=jnp.bfloat16 if args.precision == "bfloat16" else None,
        output_uint8=True,  # clip+cast on device: 4x smaller frame fetches
        packed_output=args.packed_fetch,
        packed_input=args.packed_fetch,  # host packs frames too: the device
        # skips BOTH boundary relayouts (docs/PERF.md packed-I/O serving)
    )
    if args.packed_fetch:
        from faststyle_tpu.inference import unpack_u8_host
        from faststyle_tpu.models import transform_net

        def fetch(styled, h, w):
            # the net's shape law can exceed (h, w) by up to 3 px for
            # non-mult-of-4 capture sizes; crop to the source frame size
            oh, ow = transform_net.output_shape(h, w)
            return unpack_u8_host(np.asarray(styled), oh, ow)[:, :h, :w]
    else:
        def fetch(styled, h, w):
            return np.asarray(styled)[:, :h, :w]

    from collections import deque

    depth = max(args.pipeline_depth, 1)

    if args.num_synthetic_frames > 0:
        w, h = args.resolution if args.resolution else (800, 600)
        print(f"Synthetic stream at {w}x{h}; compiling...")
        stylizer.warmup(h, w, dtypes=[np.uint8])  # frames are uint8-only here
        frames = synthetic_frames(args.num_synthetic_frames, h, w)
        t0 = time.perf_counter()
        inflight = deque()  # (t_submit, styled): fetch once `depth` are queued
        lat = []
        count = 0
        for frame in frames:
            inflight.append((time.perf_counter(), stylizer.stylize_batch(frame[None])))
            if len(inflight) > depth:
                ts, out = inflight.popleft()
                fetch(out, h, w)  # fetch oldest while newer frames compute
                lat.append(time.perf_counter() - ts)
            count += 1
        while inflight:
            ts, out = inflight.popleft()
            fetch(out, h, w)
            lat.append(time.perf_counter() - ts)
        dt = time.perf_counter() - t0
        print(f"{count} frames in {dt:.3f}s = {count / dt:.2f} fps")
        if args.report_latency and lat:
            print(_latency_line(lat))
        return

    import cv2

    if args.video_path:
        cap = cv2.VideoCapture(args.video_path)
    else:
        cap = cv2.VideoCapture(0)
        if args.resolution is not None:
            cap.set(cv2.CAP_PROP_FRAME_WIDTH, args.resolution[0])
            cap.set(cv2.CAP_PROP_FRAME_HEIGHT, args.resolution[1])
    if not cap.isOpened():
        raise SystemExit("could not open video source")
    x_new = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    y_new = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 15.0
    print(f"Resolution is: {x_new} by {y_new}")
    stylizer.warmup(y_new, x_new, dtypes=[np.uint8])  # cameras produce uint8

    fourcc = cv2.VideoWriter_fourcc(*"XVID")
    out_writer = cv2.VideoWriter(args.output_path, fourcc, src_fps, (x_new, y_new))

    count = 0
    lat = []
    t0 = time.perf_counter()

    def emit(ts, styled) -> bool:
        """Fetch a finished frame, write/display it; True to keep going."""
        img_out = fetch(styled, y_new, x_new)[0]
        lat.append(time.perf_counter() - ts)
        bgr = cv2.cvtColor(img_out, cv2.COLOR_RGB2BGR)
        out_writer.write(bgr)
        if not args.no_display:
            cv2.imshow("frame", bgr)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                return False
        return True

    inflight = deque()  # (t_submit, styled): dispatch frame N, fetch frame
    try:  # N-depth — capture/encode overlap TPU compute via async dispatch
        while True:
            # bound check BEFORE dispatching: --max_frames 0 must process
            # zero frames, not dispatch-then-emit one
            if 0 <= args.max_frames <= count + len(inflight):
                break
            ret, frame = cap.read()
            if not ret:
                break
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)  # uint8 end-to-end:
            # 4x smaller host->device transfer + 1-byte device relayouts
            inflight.append((time.perf_counter(), stylizer.stylize_batch(rgb[None])))
            if len(inflight) > depth:
                count += 1
                if not emit(*inflight.popleft()):
                    inflight.clear()
                    break
        while inflight:
            count += 1
            if not emit(*inflight.popleft()):
                break
    finally:
        dt = time.perf_counter() - t0
        if count:
            print(f"{count} frames in {dt:.2f}s = {count / dt:.2f} fps -> {args.output_path}")
            if args.report_latency and lat:
                print(_latency_line(lat))
        cap.release()
        out_writer.release()
        if not args.no_display:
            cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
