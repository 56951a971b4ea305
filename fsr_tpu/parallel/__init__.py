from fsr_tpu.parallel import sharding, spatial

__all__ = ["sharding", "spatial"]
