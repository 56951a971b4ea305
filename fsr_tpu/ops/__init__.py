from fsr_tpu.ops import easu, rcas, extras

__all__ = ["easu", "rcas", "extras"]
