"""codlad_tpu: a TPU-native JAX framework for two-stage protein backmapping.

Re-implementation of the capabilities of CODLAD (constraint-decoupled latent
diffusion for protein backmapping) designed TPU-first: static padded atom14
layouts, jit/scan-compiled sampling loops, shard_map data parallelism, and
XLA/Pallas compute kernels.
"""

__version__ = "0.1.0"
