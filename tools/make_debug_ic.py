"""Regenerate the tiny debug IC fixture (debug-32/IC + IC.npz).

Counterpart of the reference's debug-32/IC bigfile snapshot (a 32^3
2LPT IC with Position/Velocity/ID/ICDensity/Strain blocks used for
manual debugging).  Written BOTH as a bigfile dataset (debug-32/IC,
the reference container format via utils/bigfile.py) and as a plain
.npz with the same block names; produced by the in-tree GridIC app,
fully deterministic (Gadget-compatible whitenoise, seed 42).

Run from the repo root:  python tools/make_debug_ic.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    # fixture generation is a small host-side tool; run it on CPU in
    # f64 so the fixture is identical on any machine
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from pmesh_tpu.models.genic import GridIC
    from pmesh_tpu.models.powerspectrum import EHPower
    from pmesh_tpu.models.cosmology import Cosmology
    from pmesh_tpu.utils.measure import strain_tensor

    BoxSize, Ngrid, seed, a0 = 128.0, 32, 42, 0.1
    cosmo = Cosmology(Om0=0.3, Ol0=0.7)
    D1 = cosmo.D1(a0)
    ps = EHPower(cosmo)

    P, stats = GridIC(ps, BoxSize, Ngrid, D1, seed=seed, shift=0.5)
    pos = np.asarray(P['Position']) + np.asarray(P['ZA']) \
        + np.asarray(P['2LPT'])
    pos = np.remainder(pos, BoxSize).astype('f4')

    # Zel'dovich velocity: a^2 H(a) f1 Psi (Gadget internal units,
    # H0 = 100 h km/s/Mpc)
    vel = np.asarray(P['ZA']) * (
        a0 ** 2 * 100.0 * cosmo.efunc(a0) * cosmo.f1(a0))

    strain = strain_tensor(pos, BoxSize, Ngrid)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'debug-32', 'IC.npz')
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        Position=pos,
        Velocity=vel.astype('f4'),
        ID=np.asarray(P['ID'], dtype='i8'),
        ICDensity=np.asarray(P['ICDensity'], dtype='f4'),
        Strain=np.asarray(strain, dtype='f4'),
        BoxSize=np.float64(BoxSize), Ngrid=np.int64(Ngrid),
        seed=np.int64(seed), a0=np.float64(a0))
    print('wrote', out, 'stdZA=%.4f' % stats['stdZA'])

    # ... and the bigfile form (the reference's container layout)
    from pmesh_tpu.utils import bigfile as bf
    root = os.path.join(os.path.dirname(out), 'IC')
    bf.write_block(root, 'header', data=None, attrs={
        'BoxSize': np.float64(BoxSize),
        'Time': np.float64(a0),
        'TotNumPart': np.array([0, Ngrid ** 3, 0, 0, 0, 0], 'i8'),
        'Seed': np.int64(seed)})
    bf.write_block(root, '1/Position', pos)
    bf.write_block(root, '1/Velocity', vel.astype('f4'))
    bf.write_block(root, '1/ID', np.asarray(P['ID'], dtype='i8'))
    bf.write_block(root, '1/ICDensity',
                   np.asarray(P['ICDensity'], dtype='f4'))
    bf.write_block(root, '1/Strain',
                   np.asarray(strain, dtype='f4'))
    print('wrote', root)


if __name__ == '__main__':
    main()
