"""tinyfusers-tpu: a TPU-native diffusion inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Fatlonder/tinyfusers (CUDA single-GPU Stable Diffusion inference engine):

- CLIP text encoder, SD UNet, VAE — pure functional models over param pytrees
  (reference: tinyfusers/vae/encoder.py, tinyfusers/vision/unet.py,
  tinyfusers/vae/*).
- One jitted denoise step scanned over DDIM timesteps (replaces the
  reference's per-call cuDNN graph builds and explicit device syncs,
  reference variants/sd.py:27-59).
- Pallas flash-attention and fused dequant-matmul kernels (replace
  native/cuda/softmax.cu + cublasSgemm paths).
- INT8/FP8 weight-only quantization containers.
- Multi-chip sharding via jax.sharding.Mesh + NamedSharding (new capability;
  the reference is single-GPU only).
- Torch-free checkpoint loading (torch-zip pickle + safetensors), replacing
  reference storage/unpicker.py.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
