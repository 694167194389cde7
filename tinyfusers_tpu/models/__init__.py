from . import clip, dit, unet, vae  # noqa: F401
