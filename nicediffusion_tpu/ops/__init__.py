from . import attention, groupnorm, math, resize, schedule  # noqa: F401
