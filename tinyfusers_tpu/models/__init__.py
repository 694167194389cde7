from . import clip, dit, unet, vae  # noqa: F401
from . import mmdit  # noqa: F401
