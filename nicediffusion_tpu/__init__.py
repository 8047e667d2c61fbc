"""nicediffusion_tpu — a TPU-native JAX diffusion framework.

Re-implementation of the capabilities of edogariu/nice-diffusion (reference
mounted at /root/reference) designed TPU-first: NHWC flax models, the full
denoising chain as one jitted lax.scan, Pallas kernels for the hot fused ops,
and jax.sharding data parallelism over a TPU mesh.
"""

from .diffusion.process import Diffusion, VarType, LossType  # noqa: F401
from .models.unet import DiffusionModel, SuperResolutionModel  # noqa: F401

__version__ = "0.1.0"
