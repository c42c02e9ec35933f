from admp_tpu.parallel.fft import fft3d_pencil, rfft3d_pencil
from admp_tpu.parallel.sharded import (
    make_sharded_batch_energy,
    make_sharded_disp_energy,
    make_sharded_ff_energy,
    make_sharded_pairwise_energy,
    make_sharded_pme_energy,
    make_sharded_pol_energy,
)

__all__ = [
    "fft3d_pencil",
    "rfft3d_pencil",
    "make_sharded_batch_energy",
    "make_sharded_disp_energy",
    "make_sharded_ff_energy",
    "make_sharded_pairwise_energy",
    "make_sharded_pme_energy",
    "make_sharded_pol_energy",
]
