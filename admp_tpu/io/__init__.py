from admp_tpu.io.ffxml import read_ffxml
from admp_tpu.io.pdb import read_pdb
from admp_tpu.io.topology import (
    System,
    assemble_system,
    build_covalent_map_from_bonds,
    load_mpid_system,
)

__all__ = [
    "System",
    "assemble_system",
    "build_covalent_map_from_bonds",
    "load_mpid_system",
    "read_ffxml",
    "read_pdb",
]
