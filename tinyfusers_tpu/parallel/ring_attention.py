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


def _local_block(q, k, v, scale):
    """Partial attention stats for one (q_local, k_chunk) pair.

    q (..., Sq, D), k/v (..., Sk, D) ->
    (m (..., Sq, 1), l (..., Sq, 1), acc (..., Sq, D)) fp32."""
    s = jnp.einsum("...qd,...kd->...qk", q, k,
                   preferred_element_type=jnp.float32) * scale
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
    mesh: Mesh,
    axis: str,
    scale: Optional[float] = None,
) -> jax.Array:
    """Full (non-causal) attention with the sequence axis sharded over
    ``axis``. q/k/v (..., S, D) logically; physically each device holds
    S/n. Returns the attention output with the same sharding as q."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    n = mesh.shape[axis]
    ndim = q.ndim
    # Shard the sequence axis (second-to-last); everything else replicated.
    spec = P(*([None] * (ndim - 2)), axis, None)

    def local_fn(ql, kl, vl):
        m, l, acc = _local_block(ql, kl, vl, scale)
        kv = (kl, vl)

        def hop(i, carry):
            m, l, acc, (kc, vc) = carry
            kc = jax.lax.ppermute(
                kc, axis, [(j, (j + 1) % n) for j in range(n)])
            vc = jax.lax.ppermute(
                vc, axis, [(j, (j + 1) % n) for j in range(n)])
            m2, l2, a2 = _local_block(ql, kc, vc, scale)
            m, l, acc = _merge(m, l, acc, m2, l2, a2)
            return m, l, acc, (kc, vc)

        m, l, acc, _ = jax.lax.fori_loop(0, n - 1, hop, (m, l, acc, kv))
        return (acc / jnp.maximum(l, 1e-30)).astype(ql.dtype)

    shard_fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec,
    )
    return shard_fn(q, k, v)


def sequence_sharded(mesh: Mesh, axis: str, ndim: int) -> NamedSharding:
    """NamedSharding placing the (..., S, D) sequence axis on ``axis``."""
    return NamedSharding(mesh, P(*([None] * (ndim - 2)), axis, None))
