"""dcpt_tpu — a TPU-native (JAX / XLA / Pallas) image-restoration framework.

Re-implements the capabilities of DCPT ("Universal Image Restoration Pre-training
via Degradation Classification", ICLR 2025) with a TPU-first design: NHWC layouts,
functional flax archs with explicit feature outputs (instead of forward hooks),
jit-compiled train/eval steps sharded over a ``jax.sharding.Mesh``, Pallas kernels
for the hot fused ops, and orbax checkpointing.
"""

__version__ = "0.1.0"
