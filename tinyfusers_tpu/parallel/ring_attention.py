"""Ring attention: sequence-parallel SDPA over a mesh axis.

Context parallelism for token counts that outgrow one chip (SDXL
1024x1024 = 16k spatial tokens; video models beyond that). The sequence
axis is sharded across devices; each device keeps its q shard resident
while k/v shards rotate around the ring via `jax.lax.ppermute` (ICI
neighbor exchange), merging partial attention with the online-softmax
rule after each hop. Peak memory per device: O(S_local^2) logits,
O(S_local * D) activations; the full (S, S) matrix never exists.

The reference has nothing remotely like this (single GPU, SURVEY §2.6);
this is the "design the attention blockwise from day one so
sequence-sharding composes" payoff (SURVEY §5 long-context note).

Implementation is pure-jnp inside shard_map (XLA overlaps the ppermute
with the local block's compute); the per-hop local attention is exactly
ops.sdpa math with running (m, l, acc) statistics.
"""
from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _local_block(q, k, v, scale, kvalid=None):
    """Partial attention stats for one (q_local, k_chunk) pair.

    q (..., Sq, D), k/v (..., Sk, D), kvalid optional (Sk,) bool ->
    (m (..., Sq, 1), l (..., Sq, 1), acc (..., Sq, D)) fp32."""
    s = jnp.einsum("...qd,...kd->...qk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if kvalid is not None:
        s = jnp.where(kvalid, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("...qk,...kd->...qd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return m, l, acc


def _merge(m1, l1, a1, m2, l2, a2):
    m = jnp.maximum(m1, m2)
    c1 = jnp.exp(m1 - m)
    c2 = jnp.exp(m2 - m)
    return m, c1 * l1 + c2 * l2, c1 * a1 + c2 * a2


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "model",
    batch_axis: Optional[str] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Full (non-causal) attention with the sequence axis sharded over
    ``axis``. q/k/v (..., S, D) logically; physically each device holds
    S/n. Returns the attention output with the same sharding as q.

    mesh=None uses the ambient mesh (``jax.set_mesh``) — this is how
    ops.sdpa(impl="ring:...") reaches it from inside a jitted model.
    batch_axis optionally co-shards the LEADING batch dim (so data
    parallelism composes instead of being gathered at the shard_map
    boundary)."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or not mesh.shape:
            raise ValueError(
                "ring_attention: no mesh — pass mesh= or enter jax.set_mesh")
    n = mesh.shape[axis]
    ndim = q.ndim
    seq = q.shape[-2]
    # Non-divisible sequences (e.g. MMDiT joint attention: img+txt tokens)
    # are zero-padded to a multiple of n; padded KEY positions are masked
    # out with a validity vector that rotates around the ring alongside
    # k/v, and padded QUERY rows are sliced off afterwards.
    pad = (-seq) % n
    kvalid = None
    if pad:
        widths = [(0, 0)] * (ndim - 2) + [(0, pad), (0, 0)]
        q = jnp.pad(q, widths)
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
        kvalid = jnp.arange(seq + pad) < seq
    # Shard the sequence axis (second-to-last) and optionally the leading
    # batch axis; everything else replicated.
    lead = (batch_axis,) + (None,) * (ndim - 3) if ndim >= 3 else ()
    spec = P(*lead, axis, None)

    def local_fn(ql, kl, vl, kvl):
        m, l, acc = _local_block(ql, kl, vl, scale, kvl)
        kv = (kl, vl, kvl)

        def hop(i, carry):
            m, l, acc, (kc, vc, kmc) = carry
            perm = [(j, (j + 1) % n) for j in range(n)]
            kc = jax.lax.ppermute(kc, axis, perm)
            vc = jax.lax.ppermute(vc, axis, perm)
            if kmc is not None:
                kmc = jax.lax.ppermute(kmc, axis, perm)
            m2, l2, a2 = _local_block(ql, kc, vc, scale, kmc)
            m, l, acc = _merge(m, l, acc, m2, l2, a2)
            return m, l, acc, (kc, vc, kmc)

        m, l, acc, _ = jax.lax.fori_loop(0, n - 1, hop, (m, l, acc, kv))
        out = (acc / jnp.maximum(l, 1e-30)).astype(ql.dtype)
        if pad:
            # A non-divisible sequence can't be sliced while sharded:
            # gather the (padded) sequence axis here so the caller can
            # drop the pad rows; only the non-divisible case pays this.
            out = jax.lax.all_gather(out, axis, axis=ndim - 2, tiled=True)
        return out

    args = (q, k, v)
    in_specs = (spec, spec, spec)
    if kvalid is not None:
        args += (kvalid,)
        in_specs += (P(axis),)
    else:
        local_fn = _partial_no_kv(local_fn)
    out_spec = P(*lead, None, None) if pad else spec
    # check_vma=False in the pad case: the final all_gather really does
    # replicate the sequence axis, but the varying-axes checker can't
    # infer that through the fori_loop carry.
    shard_fn = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
        check_vma=not pad,
    )
    out = shard_fn(*args)
    if pad:
        out = out[..., :seq, :]
    return out


def _partial_no_kv(fn):
    return lambda q, k, v: fn(q, k, v, None)


def ring_sdpa(q, k, v, impl: str, scale: Optional[float] = None):
    """ops.sdpa's ring entry: impl = "ring[:seq_axis[,batch_axis]]"
    (e.g. "ring:model" or "ring:model,data"), ambient mesh."""
    spec = impl.split(":", 1)[1] if ":" in impl else "model"
    parts = [p for p in spec.split(",") if p]
    axis = parts[0] if parts else "model"
    batch_axis = parts[1] if len(parts) > 1 else None
    return ring_attention(q, k, v, axis=axis, batch_axis=batch_axis,
                          scale=scale)


def sequence_sharded(mesh: Mesh, axis: str, ndim: int) -> NamedSharding:
    """NamedSharding placing the (..., S, D) sequence axis on ``axis``."""
    return NamedSharding(mesh, P(*([None] * (ndim - 2)), axis, None))
