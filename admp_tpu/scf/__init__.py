from admp_tpu.scf.solver import make_induced_dipole_solver

__all__ = ["make_induced_dipole_solver"]
