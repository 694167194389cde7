from . import ddim, sd, sdxl  # noqa: F401
