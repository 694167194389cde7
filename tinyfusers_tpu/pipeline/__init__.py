from . import ddim, rectified_flow, sd, sd3, sdxl  # noqa: F401
