from admp_tpu.ops import (
    bsplines,
    dispersion,
    ewald,
    frames,
    harmonics,
    influence,
    neighborlist,
    pbc,
    realspace,
    reciprocal,
    selfenergy,
    shortrange,
)

__all__ = [
    "bsplines",
    "dispersion",
    "ewald",
    "frames",
    "harmonics",
    "influence",
    "neighborlist",
    "pbc",
    "realspace",
    "reciprocal",
    "selfenergy",
    "shortrange",
]
