from . import ddim, rectified_flow, sd, sdxl  # noqa: F401
