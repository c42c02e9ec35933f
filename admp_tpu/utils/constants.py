"""Physical constants and unit conversions.

Units follow the reference convention (reference: admp/pme.py:16, admp/pairwise.py:101,109):
lengths in Angstrom, charges in e, energies in kJ/mol.
"""

# Coulomb constant in kJ/mol * A / e^2 (reference: admp/pme.py:16).
DIELECTRIC = 1389.35455846

# Default Thole damping width used when the pair is a "real" (non-excluded)
# interaction (reference: admp/pme.py:17).
DEFAULT_THOLE_WIDTH = 0.3

# Angstrom -> Bohr (reference: admp/pairwise.py:101).
ANGSTROM_TO_BOHR = 1.889726878

# Hartree -> kJ/mol (reference: admp/pairwise.py:109).
HARTREE_TO_KJMOL = 2625.5

SQRT_PI = 1.7724538509055159
