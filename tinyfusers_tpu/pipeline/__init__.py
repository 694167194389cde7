from . import ddim, sd  # noqa: F401
