from . import checkpoint, cli, config, convert, image, profiling  # noqa: F401
