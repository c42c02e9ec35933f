from admp_tpu.utils.constants import (
    ANGSTROM_TO_BOHR,
    DEFAULT_THOLE_WIDTH,
    DIELECTRIC,
    HARTREE_TO_KJMOL,
    SQRT_PI,
)
from admp_tpu.utils.safety import masked_norm, safe_inv, safe_normalize

__all__ = [
    "ANGSTROM_TO_BOHR",
    "DEFAULT_THOLE_WIDTH",
    "DIELECTRIC",
    "HARTREE_TO_KJMOL",
    "SQRT_PI",
    "masked_norm",
    "safe_inv",
    "safe_normalize",
]
