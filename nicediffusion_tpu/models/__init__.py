from .unet import DiffusionModel, SuperResolutionModel  # noqa: F401
