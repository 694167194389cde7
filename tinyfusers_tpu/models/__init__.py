from . import clip, unet, vae  # noqa: F401
