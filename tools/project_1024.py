"""1024^3 v5e-8 step projection from measured per-chip kernels.

Multi-chip hardware is not reachable from this environment, so the
8-chip 1024^3 step is projected from the MEASURED per-chip compute
chain (tools/tune_slab.py 'pipe': paint + zy-fwd + dual x-inverse
with folded 1/k^2 + 3 zy-inv + 3 readouts at the exact per-chip
(128, 1024, 1024) shapes, chain-differenced so the axon tunnel's
~25-30 ms per-call overhead does not masquerade as kernel time —
round 2's 460-490 ms projection suffered exactly that) plus the 4
pencil-transpose all_to_alls estimated from the per-chip payload at
stated ICI bandwidths.

Run:  python tools/project_1024.py [--pipe-ms MEASURED]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pipe-ms', type=float, default=None,
                    help='measured per-chip compute chain ms '
                         '(tune_slab.py pipe); omit to re-measure')
    args = ap.parse_args()
    t_pipe = args.pipe_ms
    if t_pipe is None:
        from tools import tune_slab  # noqa: F401
        import tune_slab as ts
        raise SystemExit(
            "run `python tools/tune_slab.py pipe` on the TPU and "
            "pass the result via --pipe-ms")

    ROWS, N1, Zm = 128, 1024, 512
    # per-chip a2a payload: (ROWS, N1, Zm) f32 x2 (r, i) x2 transposes
    # per x-pass boundary x (fwd + dual-inverse shares one pair each
    # way) = 4 one-way transposes; 7/8 of each leaves the chip
    payload = 2 * ROWS * N1 * Zm * 4 * 7 / 8 / 1e9   # GB one-way
    print("measured per-chip compute chain: %.1f ms" % t_pipe)
    for bw in (50, 100, 200):
        t_a2a = 4 * payload / bw * 1000
        print("a2a @ %3d GB/s eff: 4 x %.2f GB -> %6.1f ms  |  "
              "TOTAL %7.1f ms" % (bw, payload, t_a2a,
                                  t_pipe + t_a2a))


if __name__ == '__main__':
    main()
