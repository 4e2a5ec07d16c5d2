// Native host-side depth-to-space for packed uint8 stylizer output.
//
// The packed TPU forward's most expensive residual op is the final
// C=3 boundary relayout (~1.4 ms/frame at 1080p, shuffle-bound on the
// VPU — docs/PERF.md). Serving can skip it entirely: the device returns
// the packed uint8 tensor [Hb, Wb, p*p*c] and the host interleaves it to
// [H, W, c] here, overlapped with the next frame's device compute (JAX
// dispatch is async). The reference has no counterpart (its TF graph
// emits NHWC directly, /root/reference/im_transf_net.py:73); this is a
// TPU-serving-specific native component like the TFRecord codec.
//
// Layout contract (ops/packed.py unpack_nhwc): src[by, bx, (dy*p+dx)*c+ch]
// == dst[by*p+dy, bx*p+dx, ch]; logical extent (h, w) crops the packed
// grid's zero tails.

#include <cstddef>
#include <cstdint>
#include <cstring>

extern "C" {

// src: [hb, wb, p*p*c] row-major uint8; dst: [h, w, c] row-major uint8.
// Requires h <= hb*p, w <= wb*p. Single-threaded: callers parallelize
// across frames/batch if needed (and the Python side releases the GIL via
// ctypes during the call).
void fs_unpack_u8(const uint8_t* src, uint8_t* dst, long hb, long wb,
                  long p, long c, long h, long w) {
  const long block = p * p * c;  // bytes per packed cell
  const long row_c = p * c;      // contiguous bytes per (dy) slice of a cell
  const long wfull = wb * p;     // full packed width in pixels
  for (long by = 0; by < hb; ++by) {
    const uint8_t* src_row = src + by * wb * block;
    for (long dy = 0; dy < p; ++dy) {
      const long y = by * p + dy;
      if (y >= h) return;  // rows below h are tail padding
      uint8_t* out = dst + y * w * c;
      const uint8_t* in = src_row + dy * row_c;
      if (w == wfull && row_c == 12 && block == 48) {
        // hot case (p=4, c=3): copy 16 bytes per 12-byte cell slice — the
        // 4-byte overhang lands where the next cell writes anyway (the
        // final cell uses an exact 12-byte copy to stay in bounds). Fixed
        // sizes let the compiler inline the copies; the generic path's
        // variable-length memcpy calls measured ~5x slower.
        for (long bx = 0; bx + 1 < wb; ++bx)
          std::memcpy(out + bx * 12, in + bx * 48, 16);
        std::memcpy(out + (wb - 1) * 12, in + (wb - 1) * 48, 12);
      } else if (w == wfull) {
        // aligned width: every cell contributes all p*c bytes
        for (long bx = 0; bx < wb; ++bx)
          std::memcpy(out + bx * row_c, in + bx * block, row_c);
      } else {
        long written = 0;
        for (long bx = 0; bx < wb && written < w * c; ++bx) {
          const long n = (written + row_c <= w * c) ? row_c : w * c - written;
          std::memcpy(out + written, in + bx * block, n);
          written += n;
        }
      }
    }
  }
}

}  // extern "C"
