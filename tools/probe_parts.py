"""Staged compile probe for the parts (no-copy) paint/readout kernels.

The tune_slab ro/paint sweeps hung the remote compile service three
times at the (128, 1024, 1024) shape; this probe compiles the same
kernels at increasing shapes with per-stage wall timing so the hang
can be attributed (shape-dependent Mosaic blowup vs. service flake).

Run: python tools/probe_parts.py [ext|parts|both] [maxstage]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/pmesh_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from pmesh_tpu.ops import gridpm_pallas as gpp

SHAPES = [(16, 256, 256), (32, 512, 512), (128, 1024, 512),
          (128, 1024, 1024)]


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                         .reshape(-1)[:8]))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'both'
    maxstage = int(sys.argv[2]) if len(sys.argv) > 2 else len(SHAPES)
    print("device:", jax.devices()[0], flush=True)
    for rows, n1, n2 in SHAPES[:maxstage]:
        k = jax.random.split(jax.random.key(0), 4)
        disp = tuple(0.05 + 1.9 * jax.random.uniform(
            kk, (rows, n1, n2), dtype=jnp.float32) for kk in k[:3])
        mesh = jax.random.normal(k[3], (rows, n1, n2), jnp.float32)
        mext = jnp.concatenate([mesh, mesh[:2]], 0)
        if which in ('ext', 'both'):
            t0 = time.time()
            f = jax.jit(lambda m, d: gpp.readout_fused_ext(
                (m,), d, 0, 2, 'cic')[0])
            sync(f(mext, disp))
            print("ext    %4dx%dx%d compile+run %.1fs"
                  % (rows, n1, n2, time.time() - t0), flush=True)
        if which in ('parts', 'both'):
            t0 = time.time()
            g = jax.jit(lambda m, d: gpp.readout_fused_parts(
                (m,), d, 0, 2, 'cic')[0])
            sync(g(mesh, disp))
            print("parts  %4dx%dx%d compile+run %.1fs"
                  % (rows, n1, n2, time.time() - t0), flush=True)
        if which in ('paint', 'both'):
            t0 = time.time()
            h = jax.jit(lambda d: gpp.paint_fused_parts(
                d, 1.0, 0, 2, 'cic'))
            sync(h(disp))
            print("paint  %4dx%dx%d compile+run %.1fs"
                  % (rows, n1, n2, time.time() - t0), flush=True)


if __name__ == '__main__':
    main()
