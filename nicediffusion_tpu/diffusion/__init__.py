from .process import Diffusion, VarType, LossType  # noqa: F401
