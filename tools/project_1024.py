"""1024^3 v5e-8 step projection from measured per-chip kernels.

Multi-chip hardware is not reachable from this environment, so the
8-chip 1024^3 step is projected from the MEASURED per-chip compute
chain (tools/tune_slab.py 'pipe' / 'pipe_bf16' / 'pipe_grad': paint +
zy-fwd + x-inverse(s) with folded 1/k^2 + zy-inverse(s) + readout(s)
at the exact per-chip (128, 1024, 1024) shapes, chain-differenced so
the axon tunnel's ~25-30 ms per-call overhead does not masquerade as
kernel time — round 2's 460-490 ms projection suffered exactly that)
plus the pencil-transpose all_to_alls estimated from the per-chip
payload at stated ICI bandwidths.

a2a payload per force step (per chip, one-way, 7/8 leaves the chip):
  spectral: fwd (r, i) + back (sr, si) + (gr, gi)  = 3 pairs
  gradient: fwd (r, i) + back (sr, si)             = 2 pairs
  bf16 spectrum storage halves every pair.

Run:  python tools/project_1024.py --pipe-ms A [--pipe-bf16-ms B]
          [--pipe-grad-ms C] [--pipe-grad-bf16-ms D]
"""
import argparse

ROWS, N1, Zm = 128, 1024, 512
PAIR_GB = 2 * ROWS * N1 * Zm * 4 / 1e9      # one (r, i) f32 pair


def row(tag, pipe_ms, npairs, half):
    payload = npairs * PAIR_GB * (0.5 if half else 1.0) * 7 / 8
    print("%-26s compute %6.1f ms | a2a %.2f GB:" %
          (tag, pipe_ms, payload), end="")
    for bw in (50, 100, 200):
        t = pipe_ms + payload / bw * 1000
        print("  %3d GB/s -> %6.1f ms" % (bw, t), end="")
    print()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pipe-ms', type=float, required=True,
                    help="tune_slab.py pipe (spectral f32)")
    ap.add_argument('--pipe-bf16-ms', type=float, default=None)
    ap.add_argument('--pipe-grad-ms', type=float, default=None)
    ap.add_argument('--pipe-grad-bf16-ms', type=float, default=None)
    a = ap.parse_args()
    print("per-chip (128, 1024, 1024) measured compute chains + "
          "projected a2a at stated ICI bandwidths:")
    row("spectral f32", a.pipe_ms, 3, False)
    if a.pipe_bf16_ms is not None:
        row("spectral bf16 spectra", a.pipe_bf16_ms, 3, True)
    if a.pipe_grad_ms is not None:
        row("gradient f32", a.pipe_grad_ms, 2, False)
    if a.pipe_grad_bf16_ms is not None:
        row("gradient bf16 spectra", a.pipe_grad_bf16_ms, 2, True)


if __name__ == '__main__':
    main()
