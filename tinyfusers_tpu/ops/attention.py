"""Scaled dot-product attention.

Replaces the reference's SDPA (attention/sdpa.py:53-77: CuPy matmul →
explicit device sync → handwritten CUDA row-softmax kernel → CuPy matmul)
with either:

- the XLA path: one fused einsum→softmax→einsum expression, fp32 softmax
  statistics — XLA fuses the mask add and the scale; or
- the Pallas flash-attention kernel (kernels/flash_attention.py):
  blockwise online softmax, O(seq) memory, used on TPU for large token
  counts (SD self-attention at 64x64 latents = 4096 tokens, SDXL = 16k).

Dispatch is automatic (TPU + shapes large enough + no dtype oddities) and
can be forced either way with ``impl=``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def sdpa_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """Reference-math SDPA: softmax(scale * q @ k^T + mask) @ v.

    q: (..., Sq, D), k/v: (..., Sk, D); mask broadcastable to
    (..., Sq, Sk), additive (or boolean: True = keep).
    """
    dtype = q.dtype
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    logits = jnp.einsum(
        "...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    if mask is not None:
        if mask.dtype == jnp.bool_:
            logits = jnp.where(mask, logits, jnp.float32(-jnp.inf))
        else:
            logits = logits + mask.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "...qk,...kd->...qd",
        weights.astype(dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(dtype)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def packed_beneficial(sq: int, sk: int, channels: int, heads: int,
                      itemsize: int = 2) -> bool:
    """Whether the heads-packed flash path applies (models use this at
    trace time to pick between channel-packed attention and the classic
    bhsd layout — when the packed kernel can't run, feeding it packed
    tensors just adds unpack/repack relayouts)."""
    from ..kernels.flash_attention import packed_ok

    return _on_tpu() and sq >= 1024 and packed_ok(sq, sk, channels, heads,
                                                  itemsize)


# -- differentiable flash wrappers -------------------------------------
# The Pallas kernels have no JVP/VJP rules; training paths differentiate
# through attention (LoRA/full fine-tune on TPU routes the UNet's
# self-attention here). custom_vjp keeps the FAST flash kernel as the
# forward (O(S) memory, the inference path unchanged) and computes the
# backward with the exact-math XLA expression's vjp from the saved
# (q, k, v) — the standard analytic softmax-attention gradient, O(S^2)
# transient memory in backward only (pair with remat for big batches; a
# blockwise Pallas backward kernel is the future upgrade if fine-tuning
# at 16k-token SDXL geometries becomes a bottleneck).

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_packed_diff(q, k, v, heads: int, scale, kv_len=None):
    from ..kernels.flash_attention import flash_attention

    return flash_attention(q, k, v, scale=scale, layout="packed",
                           heads=heads, kv_len=kv_len)


def _flash_packed_fwd(q, k, v, heads, scale, kv_len=None):
    return _flash_packed_diff(q, k, v, heads, scale, kv_len), (q, k, v)


def _flash_packed_bwd(heads, scale, kv_len, res, g):
    q, k, v = res
    b, sq, c = q.shape
    sk = k.shape[1]
    sk_r = kv_len if kv_len is not None else sk
    d = c // heads

    def ref(q_, k_, v_):
        unpack = lambda x, s, n: x[:, :n].reshape(  # noqa: E731
            b, n, heads, d).transpose(0, 2, 1, 3)
        o = sdpa_xla(unpack(q_, sq, sq), unpack(k_, sk, sk_r),
                     unpack(v_, sk, sk_r), scale=scale)
        return o.transpose(0, 2, 1, 3).reshape(b, sq, c)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


_flash_packed_diff.defvjp(_flash_packed_fwd, _flash_packed_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_bhsd_diff(q, k, v, scale, kv_len=None):
    from ..kernels.flash_attention import flash_attention

    return flash_attention(q, k, v, scale=scale, kv_len=kv_len)


def _flash_bhsd_fwd(q, k, v, scale, kv_len=None):
    return _flash_bhsd_diff(q, k, v, scale, kv_len), (q, k, v)


def _flash_bhsd_bwd(scale, kv_len, res, g):
    q, k, v = res

    def ref(q_, k_, v_):
        # kv_len: keys beyond it are caller-side padding — slice them out
        # (the slice's vjp zero-pads dk/dv back to full shape)
        kk = k_[..., :kv_len, :] if kv_len is not None else k_
        vv = v_[..., :kv_len, :] if kv_len is not None else v_
        return sdpa_xla(q_, kk, vv, scale=scale)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


_flash_bhsd_diff.defvjp(_flash_bhsd_fwd, _flash_bhsd_bwd)


def sdpa_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    heads: int,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
    kv_len: Optional[int] = None,
) -> jax.Array:
    """SDPA over channel-packed activations: q (B, Sq, H*d), k/v
    (B, Sk, H*d) -> (B, Sq, H*d). The models' native layout goes
    straight in and out. kv_len: real key count for pre-padded k/v.

    On TPU with packed-friendly geometry this runs the heads-packed
    flash kernel — no (B,S,H,d)<->(B,H,S,d) relayout is ever
    materialized in HBM (measured ~8% of a whole SD attention block).
    Everything else unpacks to bhsd, dispatches through sdpa(), and
    packs back (reshapes around a transpose XLA usually fuses).
    """
    from ..kernels.flash_attention import packed_ok

    b, sq, c = q.shape
    sk = k.shape[1]
    d = c // heads
    if impl is None:
        impl = _default_impl(q, None)
    if impl == "flash" and packed_ok(
            sq, sk, c, heads, jnp.dtype(q.dtype).itemsize):
        return _flash_packed_diff(q, k, v, heads, scale, kv_len)
    unpack = lambda x, s: x.reshape(b, s, heads, d).transpose(0, 2, 1, 3)  # noqa: E731
    o = sdpa(unpack(q, sq), unpack(k, sk), unpack(v, sk),
             scale=scale, impl=impl, kv_len=kv_len)
    return o.transpose(0, 2, 1, 3).reshape(b, sq, c)


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
    kv_len: Optional[int] = None,
) -> jax.Array:
    """Dispatching SDPA (bhsd layout: q (..., Sq, D), k/v (..., Sk, D)).
    impl in {None, 'xla', 'flash', 'ring[:seq_axis[,batch_axis]]'}.

    kv_len: number of real keys when k/v arrive pre-padded on the token
    axis (see kernels/flash_attention.py) — columns beyond are masked.

    'ring' is the sequence-parallel path (parallel/ring_attention.py):
    the token axis is sharded over the named mesh axis and k/v shards
    rotate via ppermute. Opt-in via model configs
    (UNetConfig.self_attn_impl / MMDiTConfig.attn_impl) so the choice is
    part of jit's static config — never a mid-trace global."""
    if impl is None:
        impl = _default_impl(q, mask)
    if impl == "flash":
        if mask is not None:
            from ..kernels.flash_attention import flash_attention

            return flash_attention(q, k, v, mask=mask, scale=scale)
        return _flash_bhsd_diff(q, k, v, scale, kv_len)
    if impl.startswith("ring"):
        from ..parallel.ring_attention import ring_sdpa

        assert mask is None, "ring attention does not support masks yet"
        assert kv_len is None, "ring attention does not support kv_len"
        return ring_sdpa(q, k, v, impl, scale=scale)
    if kv_len is not None:
        k = k[..., :kv_len, :]
        v = v[..., :kv_len, :]
    return sdpa_xla(q, k, v, mask, scale=scale)


def _default_impl(q: jax.Array, mask) -> str:
    # Flash kernel pays off once Sq is big enough to block (SD UNet
    # self-attention: 4096/1024 tokens). Small sequences (CLIP's 77) and
    # non-TPU backends use the XLA path.
    if _on_tpu() and mask is None and q.shape[-2] >= 1024:
        return "flash"
    return "xla"
