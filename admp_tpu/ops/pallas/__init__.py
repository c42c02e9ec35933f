from admp_tpu.ops.pallas.spread import pallas_spread_available, spread_to_mesh_pallas

__all__ = ["pallas_spread_available", "spread_to_mesh_pallas"]
