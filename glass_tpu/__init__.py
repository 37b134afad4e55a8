"""glass_tpu: a TPU-native end-to-end scene-text spotting framework.

A from-scratch JAX/XLA/Pallas re-design of the GLASS text-spotting stack
(rotated-box detection + cardinal orientation + global/local fused attention
recognition), built for TPU: static shapes everywhere, pjit/shard_map data
parallelism over a device mesh, and on-device replacements for every native
CUDA/C++ op the reference family depends on.
"""

__version__ = "0.1.0"
