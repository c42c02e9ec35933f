"""Synthetic water-box fixtures; thin shim over admp_tpu.systems."""

from admp_tpu.systems import water_lattice, water_system


def water_arrays(n_side=2, spacing=3.1, jitter=0.1, seed=0):
    return water_system(n_side, spacing, jitter, seed)
