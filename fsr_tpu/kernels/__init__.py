from fsr_tpu.kernels import dispatch, easu_gather, fused, rcas_pallas

__all__ = ["dispatch", "easu_gather", "fused", "rcas_pallas"]
