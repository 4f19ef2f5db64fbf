"""Roofline decomposition of the measured per-chip pipe stages.

For each stage of the sharded 1024^3 force step's per-chip compute
chain (the (128, 1024, 1024) slab shapes measured by
tools/tune_slab.py), this models

- HBM bytes moved (minimum: each operand read once, each output
  written once), against the MEASURED effective bandwidth of this
  chip (393 GB/s, tune_slab 'hbm' chain-differenced), and
- MXU FLOPs of the DFT/CT matmuls, against the v5e bf16 peak
  (197 TFLOP/s) divided by the f32-exact pass count (the production
  kernels run precision='float32', i.e. 6 bf16 passes; 3-pass
  'tensorfloat'-grade shown for comparison),

and classifies each stage as HBM-bound, MXU-bound, or neither
(= VPU/scheduling-bound: the paint/readout window arithmetic).

The point (round-3 verdict item 2): decompose the gap between the
measured 60.3 ms chain and its ~10 ms pure-HBM floor into (a) MXU
time that is REAL WORK under f32-exact DFT matmuls and (b) true
headroom.  Conclusion it surfaces: the z-axis full DFT matmuls
(1024 -> 512 half-spectrum, 275 GFLOP per pass, 4 passes per step)
are the single largest term — Cooley-Tukey factoring the z axis the
way x/y already are would cut those FLOPs ~8x.

Run:  python tools/roofline.py [--pipe-ms 60.3] [--hbm-gbps 393]
(no TPU needed; pure arithmetic on the stage models + measured times)
"""
import argparse

ROWS, N1, N2 = 128, 1024, 1024
Zm = N2 // 2
SLAB_GB = ROWS * N1 * N2 * 4 / 1e9          # one f32 mesh-shaped array
PAIR_GB = 2 * ROWS * N1 * Zm * 4 / 1e9      # one (r, i) half-spectrum

BF16_TFLOPS = 197.0     # v5e MXU peak
PASSES_F32 = 6          # precision='float32' (HIGHEST) bf16 passes
PASSES_3X = 3           # bf16_3x grade, for comparison


def gf_z_dft():
    """One z-axis pass: (ROWS*N1, N2) @ (N2, Zm) twice (r, i) — or the
    transposed irfft pair yr@A + yi@B with A, B (Zm, N2).  Both are
    2 matmuls x 2*rows*N2*Zm FLOPs."""
    rows = ROWS * N1
    return 2 * (2 * rows * N2 * Zm) / 1e9


def gf_ct(n, complex_elems):
    """Two-factor Cooley-Tukey over length n on complex data:
    2 stages x 4 real matmuls x 2*sqrt(n) FLOPs per element."""
    r = int(round(n ** 0.5))
    return 2 * 4 * (2 * r) * complex_elems / 1e9


CELLS = ROWS * N1 * N2          # real mesh elements per chip
HALF = ROWS * N1 * Zm           # complex half-spectrum elements


def stages(measured):
    """(name, hbm_gb, mxu_gflops, measured_ms) rows for the spectral
    f32 chain.  measured: dict of per-stage chain-differenced ms
    (tune_slab tags; None if not re-measured this round)."""
    ct_y = gf_ct(N1, HALF)      # y-axis CT inside a zy kernel
    ct_x = gf_ct(N1, HALF)      # x-axis CT (over N1=1024 locally)
    return [
        # paint: read 3 displacement slabs, write the mesh; the 27
        # CIC shift passes are VPU work (window weights), not MXU
        ("paint (27-shift CIC)", 4 * SLAB_GB, 0.0,
         measured.get('paint')),
        # zy-fwd: read slab, write (r,i) pair + nyquist plane;
        # z full-DFT matmul + y CT
        ("zy-fwd ct2", SLAB_GB + PAIR_GB, gf_z_dft() + ct_y,
         measured.get('zy_fwd')),
        # x dual inverse: read pair, write 2 pairs (Poisson + grad-x
        # folded); 2 x-CT transforms sharing the read
        ("x-ct dual inverse (+1/k^2)", 3 * PAIR_GB, 2 * ct_x,
         measured.get('x_dual')),
        # zy-inv dual: read 1 pair, write fy+fz slabs; 2 y-CT +
        # 2 z-irfft matmul pairs
        ("zy-inv dual (fy, fz)", PAIR_GB + 2 * SLAB_GB,
         2 * (gf_z_dft() + ct_y), measured.get('zy_inv_dual')),
        # zy-inv single: read pair, write fx slab
        ("zy-inv single (fx)", PAIR_GB + SLAB_GB,
         gf_z_dft() + ct_y, measured.get('zy_inv')),
        # readouts: read 3 force meshes + 3 disp (shared), write 3
        # value slabs; VPU-bound window arithmetic (measured 12.5 ms
        # vs 1.4 ms HBM floor, tune_slab note)
        ("3x readout (CIC)", (3 + 3 + 3) * SLAB_GB, 0.0,
         measured.get('readout3')),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pipe-ms', type=float, default=60.3,
                    help="measured full-chain ms (tune_slab 'pipe')")
    ap.add_argument('--hbm-gbps', type=float, default=393.0,
                    help="measured effective HBM GB/s (tune_slab "
                         "'hbm')")
    # per-stage measured ms (round-3/4 chain-differenced defaults;
    # pass fresh values after a tune_slab re-run)
    ap.add_argument('--paint-ms', type=float, default=None)
    ap.add_argument('--zy-fwd-ms', type=float, default=14.7)
    ap.add_argument('--x-dual-ms', type=float, default=7.5)
    ap.add_argument('--zy-inv-dual-ms', type=float, default=None)
    ap.add_argument('--zy-inv-ms', type=float, default=11.1)
    ap.add_argument('--readout3-ms', type=float, default=13.3)
    a = ap.parse_args()

    measured = {'paint': a.paint_ms, 'zy_fwd': a.zy_fwd_ms,
                'x_dual': a.x_dual_ms,
                'zy_inv_dual': a.zy_inv_dual_ms,
                'zy_inv': a.zy_inv_ms, 'readout3': a.readout3_ms}
    rows = stages(measured)

    f32_tf = BF16_TFLOPS / PASSES_F32
    tf3x = BF16_TFLOPS / PASSES_3X
    print("per-chip (%d, %d, %d) stage rooflines "
          "(HBM %.0f GB/s measured; MXU %.0f TF bf16 -> %.1f TF "
          "f32-exact %d-pass):"
          % (ROWS, N1, N2, a.hbm_gbps, BF16_TFLOPS, f32_tf,
             PASSES_F32))
    hdr = ("%-28s %7s %9s %8s %8s %8s %9s %s"
           % ("stage", "GB", "GFLOP", "hbm ms", "mxu ms",
              "floor", "measured", "bound"))
    print(hdr)
    tot_floor = tot_meas = 0.0
    z_mxu_ms = 0.0
    for name, gb, gf, ms in rows:
        hbm_ms = gb / a.hbm_gbps * 1000
        mxu_ms = gf / f32_tf
        floor = max(hbm_ms, mxu_ms)
        tot_floor += floor
        if ms is not None:
            tot_meas += ms
        bound = ("MXU" if mxu_ms > hbm_ms * 1.5 else
                 "HBM" if hbm_ms > mxu_ms * 1.5 else "mixed")
        if gf == 0.0:
            bound = "VPU"
        print("%-28s %7.2f %9.0f %8.2f %8.2f %8.2f %9s %s"
              % (name, gb, gf, hbm_ms, mxu_ms, floor,
                 ("%.1f" % ms) if ms is not None else "-", bound))
        if "zy" in name:
            z_mxu_ms += gf_z_dft() * (2 if "dual" in name else 1) \
                / f32_tf
    print("-" * len(hdr))
    print("%-28s %34s %8.2f %9.1f"
          % ("total (stages w/ models)", "", tot_floor, a.pipe_ms))
    print()
    # dense z pass: 2*2*Zm = 2048 FLOPs per input element; a CT split
    # R=8 x M=128 on z costs ~4*M = 512 (real fwd) per element plus
    # VPU twiddle-butterflies -> ~4x fewer MXU FLOPs
    ct_ratio = (2 * 2 * Zm) / (4.0 * 128)
    print("z-axis full-DFT matmul time at f32-exact: %.1f ms of the "
          "%.1f ms chain" % (z_mxu_ms, a.pipe_ms))
    print("  -> CT-factoring z (R=8, M=128, like x/y) cuts those "
          "FLOPs ~%.0fx: saves up to %.1f ms"
          % (ct_ratio, z_mxu_ms * (1 - 1 / ct_ratio)))
    print("  -> at 3-pass (bf16_3x) matmuls the same z passes cost "
          "%.1f ms" % (z_mxu_ms * PASSES_3X / PASSES_F32))


if __name__ == '__main__':
    main()
