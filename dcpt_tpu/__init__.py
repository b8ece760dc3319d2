"""dcpt_tpu — a TPU-native (JAX / XLA / Pallas) image-restoration framework.

Re-implements the capabilities of DCPT ("Universal Image Restoration Pre-training
via Degradation Classification", ICLR 2025) with a TPU-first design: NHWC layouts,
functional flax archs with explicit feature outputs (instead of forward hooks),
jit-compiled train/eval steps sharded over a ``jax.sharding.Mesh``, Pallas kernels
for the hot fused ops, and orbax checkpointing.
"""

__version__ = "0.1.0"

# mirror the reference's package surface (basicsr/__init__.py re-exports all
# subsystems): `import dcpt_tpu` registers every dataset/arch/model/loss/metric
from . import archs, data, losses, metrics, models, ops, parallel, utils  # noqa: E402,F401
from .archs import build_network  # noqa: E402,F401
from .data import build_dataloader, build_dataset  # noqa: E402,F401
from .losses import build_loss  # noqa: E402,F401
from .metrics import calculate_metric  # noqa: E402,F401
from .models import build_model  # noqa: E402,F401
