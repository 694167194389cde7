"""Pallas flash attention (TPU).

Replaces the reference's SDPA hot path — CuPy matmul + explicit device
sync + handwritten CUDA row-softmax kernel + CuPy matmul
(attention/sdpa.py:53-77, native/cuda/softmax.cu) — with a blockwise
online-softmax kernel: O(seq) memory, no (Sq, Sk) logits materialized in
HBM, fp32 softmax statistics, MXU matmuls per block.

Designed blockwise from day one so sequence sharding composes later
(SURVEY.md §5 long-context note): SDXL's 16k spatial tokens and
ring-attention variants reuse the same inner kernel.

Grid: (batch*heads, num_q_blocks, num_k_blocks); the k dimension is the
innermost (sequential on TPU), carrying running max/denominator/accum in
VMEM scratch across k steps.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634


def _kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
            sk_real: int, block_k: int, causal: bool,
            block_q: int, nk: int):
    i = pl.program_id(1)
    j = pl.program_id(2)
    # Which k blocks need masking is known statically: only the last block
    # can hold key padding, and only when sk_real isn't block-aligned —
    # skipping the iota/compare/select saves real VPU time per block.
    pad_cols = nk * block_k != sk_real

    def logits():
        # q arrives prescaled by scale*log2(e) (see flash_attention below):
        # the softmax runs in base-2 (exp2), and no full (block_q, block_k)
        # multiply pass is ever spent on the scale.
        q = q_ref[0]  # (block_q, d)
        k = k_ref[0]  # (block_k, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k), base-2 logits

        col = None
        if pad_cols:
            col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < sk_real, s, NEG_INF)
        if causal:
            if col is None:
                col = j * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 1)
            row = i * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            s = jnp.where(col <= row, s, NEG_INF)
        return s

    def pv(p):
        return jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if nk == 1:
        # Single k block: plain in-block softmax, no running statistics.
        s = logits()
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if pad_cols or causal:
            l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (pv(p) / l).astype(o_ref.dtype)
        return

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def compute():
        s = logits()
        m_prev = m_scr[:]          # (block_q, 1)
        l_prev = l_scr[:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)    # (block_q, block_k)
        correction = jnp.exp2(m_prev - m_new)
        l_new = correction * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc_scr[:] * correction + pv(p)
        m_scr[:] = m_new
        l_scr[:] = l_new
        acc_scr[:] = acc

    if causal:
        # Skip fully-masked k blocks above the diagonal.
        first_masked = (j * block_k) > (i * block_q + block_q - 1)

        @pl.when(jnp.logical_not(first_masked))
        def _():
            compute()
    else:
        compute()

    @pl.when(j == nk - 1)
    def _finish():
        l = l_scr[:]
        l = jnp.where(l == 0.0, 1.0, l)  # fully-masked (padded) rows -> 0
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def _kernel_packed(q_ref, k_ref, v_ref, o_ref, *,
                   sk_real: int, block_k: int, block_q: int,
                   heads: int, d: int):
    """Heads-packed kernel: blocks are (1, block, H*d) — the model's
    native channel-packed activation layout, so NO (B,S,H,d)<->(BH,S,d)
    relayout copy is ever materialized in HBM around the kernel (that
    copy measured ~1.2 ms/UNet-forward in the round-2 device trace, and
    a packed-vs-transposed A/B of a whole attention block measured
    4.06 ms vs 4.41 ms at SD1.5 64x64 geometry).

    Per-head q/k/v tiles are static lane slices of the packed block
    (in-VMEM relayouts, far cheaper than HBM copies). Mosaic cannot
    lower per-head blocked DMAs ((1, bq, 1, d) blocks violate tile
    alignment; rank-changing slice stores are "unsupported shape cast"),
    which is why the head axis rides the lane dimension instead.

    Single k block only (nk==1): the wrapper guarantees the whole
    (padded) key sequence fits one block — SD/SDXL self- and
    cross-attention geometries all do. Multi-k would need lane-sliced
    read-modify-write of running stats per head per k step, which
    measured 2x slower than the flattened-grid kernel; callers with
    nk>1 use layout='bhsd'.
    """
    j = pl.program_id(2)
    del j  # grid is (B, nq, 1)
    pad_cols = block_k != sk_real
    qf = q_ref[0]  # (block_q, H*d), prescaled by scale*log2(e)
    kf = k_ref[0]  # (block_k, H*d)
    vf = v_ref[0]

    for hh in range(heads):
        q = qf[:, hh * d:(hh + 1) * d]
        k = kf[:, hh * d:(hh + 1) * d]
        v = vf[:, hh * d:(hh + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if pad_cols:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < sk_real, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if pad_cols:
            l = jnp.where(l == 0.0, 1.0, l)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # Store each head's lanes immediately (2D lane-sliced store) —
        # accumulating all heads for one final concat kept every head's
        # fp32 logits alive on the vector stack at once and blew the
        # 16 MB VMEM scope at SDXL's (bq=512, bk=1024, H=20) geometry.
        o_ref[0, :, hh * d:(hh + 1) * d] = (o / l).astype(o_ref.dtype)


def _kernel_packed_multik(q_ref, k_ref, v_ref, o_ref, *scratch,
                          sk_real: int, block_k: int, block_q: int,
                          heads: int, d: int, nk: int):
    """Multi-k-block heads-packed kernel (round-5, built for SD3's joint
    attention: c=1536 exceeds the single-block VMEM budget).

    Per-head online-softmax statistics live in SEPARATE scratch buffers
    (``scratch`` is H m-refs, then H l-refs, then H acc-refs): each
    head's running max/denominator/accumulator is a full-buffer RMW —
    NOT the lane-sliced RMW of one wide stats buffer that measured 2x
    slower in round 3. Head tiles are static lane slices of the packed
    blocks like _kernel_packed."""
    j = pl.program_id(2)
    m_s = scratch[:heads]
    l_s = scratch[heads:2 * heads]
    acc_s = scratch[2 * heads:]
    pad_cols = nk * block_k != sk_real
    qf = q_ref[0]  # (block_q, H*d), prescaled by scale*log2(e)
    kf = k_ref[0]  # (block_k, H*d)
    vf = v_ref[0]

    @pl.when(j == 0)
    def _init():
        for hh in range(heads):
            m_s[hh][:] = jnp.full_like(m_s[hh], NEG_INF)
            l_s[hh][:] = jnp.zeros_like(l_s[hh])
            acc_s[hh][:] = jnp.zeros_like(acc_s[hh])

    for hh in range(heads):
        q = qf[:, hh * d:(hh + 1) * d]
        k = kf[:, hh * d:(hh + 1) * d]
        v = vf[:, hh * d:(hh + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if pad_cols:
            col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < sk_real, s, NEG_INF)
        m_prev = m_s[hh][:]
        l_prev = l_s[hh][:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)
        correction = jnp.exp2(m_prev - m_new)
        l_s[hh][:] = correction * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_s[hh][:] = acc_s[hh][:] * correction + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_s[hh][:] = m_new

    @pl.when(j == nk - 1)
    def _finish():
        for hh in range(heads):
            l = l_s[hh][:]
            l = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, :, hh * d:(hh + 1) * d] = (
                acc_s[hh][:] / l).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, mult: int) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _default_blocks(sq: int, sk: int, d: int) -> tuple:
    """Block sizes tuned on TPU v5e (benchmarks/flash_sweep.py, chained
    device timing; retuned after the exp2/prescale kernel change). The
    big self-attention shapes prefer a full-Sk single k pass (nk=1: no
    online-softmax corrections or scratch RMW) when VMEM allows.

    The k block snaps to the PADDED sequence when that still fits one
    block: a fixed bk=4096 at sk=4173 (MMDiT's joint img+txt sequence)
    pads keys to 8192 — double the matmul work on garbage columns, which
    measured as ~63% of an SD3 forward spent in attention (the round-2
    -> round-3 SD3 regression). bk=4224 makes it one clean block."""
    skp = -(-max(sk, 128) // 128) * 128  # sk rounded up to the lane tile
    if sk >= 4096:
        if d <= 96:
            # SD1.5 64x64 (16,4096,40) -> 1.72 ms; SDXL 32x (20,4096,64)
            # -> 2.53 ms; MMDiT joint 4173 -> one 4224 block.
            # Cap: the fp32 logits block bq*bk*4 must stay a few MB —
            # beyond ~4.6k keys (e.g. SDXL 1024px VAE at 16k) go multi-k.
            if skp <= 4608:
                return 256, skp
            return 256, 4096
        return 128, 4096   # VAE mid:    (1, 4096, 512) -> 0.81 ms
    return 512, 1024       # (16, 1024, 80) -> ~0.62 ms; mid-size default


def packed_ok(sq: int, sk: int, channels: int, heads: int,
              itemsize: int = 2) -> bool:
    """Whether the heads-packed single-k-block kernel applies: the whole
    padded key sequence (x2 for k and v, x2 for Pallas double-buffering)
    must fit comfortably in the ~16 MB of VMEM."""
    if channels % heads:
        return False
    if channels * itemsize > 2048:
        # Empirical Mosaic compile bound: c=1280/H=20 (SDXL 16x level)
        # OOMs the 16 MB VMEM scope even at bq=256 — the many per-head
        # lane-slice relayouts of wide blocks need too much scratch. The
        # classic bhsd kernel is cheap at those (short-sequence) shapes.
        return False
    sk_pad = -(-max(sk, 128) // 128) * 128
    # 6 MB/tensor: k+v = 12 MB + q/out blocks + fp32 logits still fit
    # (SDXL's (2, 4096, 640) bf16 case measured working and faster).
    return sk_pad * channels * itemsize <= 6 * 1024 * 1024


def packed_multik_ok(sq: int, sk: int, channels: int, heads: int,
                     itemsize: int = 2) -> bool:
    """Whether the multi-k-block heads-packed kernel applies: key
    sequence too large for one VMEM block, but per-k-step kv blocks +
    per-head stats fit the raised (64 MB) VMEM cap. Built for SD3's
    joint attention ((2, 4173, 24x64) bf16) — the bhsd fallback there
    paid ~11 ms/forward of head-transpose relayout copies."""
    if channels % heads:
        return False
    d = channels // heads
    if d % 8 or d < 32:
        return False  # head slices must stay sublane-tileable
    if channels * itemsize > 4096:
        return False  # kv block DMA budget (c up to 2048 at bf16)
    return sq >= 1024 and sk >= 1024


def _flash_packed_multik(q, k, v, *, heads, scale, block_q, block_k,
                         interpret, kv_len=None):
    b, sq, c = q.shape
    sk = k.shape[1]
    sk_real = kv_len if kv_len is not None else sk
    d = c // heads
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    qs = q * jnp.asarray(scale * LOG2E, q.dtype)
    bq = min(block_q or 256, max(8, sq))
    # kv blocks ~4.3 MB each at SD3 geometry: 1408 lanes x 1536 ch bf16.
    # 128-multiple; fewer k steps = fewer online corrections.
    bk = min(block_k or 1408, -(-max(sk, 128) // 128) * 128)
    q3 = _pad_to(qs, 1, bq)
    k3 = _pad_to(k, 1, bk)
    v3 = _pad_to(v, 1, bk)
    nq = q3.shape[1] // bq
    nk = k3.shape[1] // bk
    scratch = ([pltpu.VMEM((bq, 1), jnp.float32)] * heads
               + [pltpu.VMEM((bq, 1), jnp.float32)] * heads
               + [pltpu.VMEM((bq, d), jnp.float32)] * heads)
    out = pl.pallas_call(
        functools.partial(
            _kernel_packed_multik, sk_real=sk_real, block_k=bk, block_q=bq,
            heads=heads, d=d, nk=nk),
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, bk, c), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, bk, c), lambda g, i, j: (g, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda g, i, j: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q3.shape, q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q3, k3, v3)
    return out[:, :sq]


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "causal", "block_q", "block_k", "interpret",
        "layout", "heads", "kv_len",
    ),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask=None,
    *,
    scale: Optional[float] = None,
    causal: bool = False,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
    layout: str = "bhsd",
    heads: Optional[int] = None,
    kv_len: Optional[int] = None,
) -> jax.Array:
    """softmax(scale * q @ k^T [+ causal]) @ v, blockwise.

    layout='bhsd' (default): q (..., Sq, D), k/v (..., Sk, D) — lead axes
    flattened into the grid. layout='packed': q (B, Sq, H*d), k/v
    (B, Sk, H*d) with ``heads=H`` — the models' native channel-packed
    activations go straight in and out (no head-transpose relayouts);
    requires packed_ok() geometry (whole key sequence in one k block).

    kv_len: number of REAL keys when the caller passes k/v already
    padded on the token axis (the softmax masks columns >= kv_len).
    Lets callers fold padding into an upstream concat (e.g. MMDiT's
    joint [img ‖ txt ‖ zeros] sequence) instead of paying a separate
    HBM pad + unpad-slice around the kernel.

    Explicit ``mask`` arrays are not supported here (use ops.sdpa_xla);
    ``causal=True`` covers the causal-mask case without materializing
    one. block_q/block_k default to shape-tuned values (_default_blocks).
    """
    if mask is not None:
        raise ValueError("flash_attention: use causal=, not explicit masks")
    if kv_len is not None and kv_len > k.shape[-2]:
        raise ValueError(f"kv_len={kv_len} exceeds key length {k.shape[-2]}")
    if layout == "packed":
        if q.ndim != 3 or heads is None:
            raise ValueError(
                f"layout='packed' needs (B,S,H*d) + heads=, got {q.shape}")
        if causal:
            raise ValueError("layout='packed' does not support causal")
        b, sq, c = q.shape
        sk = k.shape[1]
        d = c // heads
        itemsize = jnp.dtype(q.dtype).itemsize
        sk_real = kv_len if kv_len is not None else sk
        if not packed_ok(sq, sk, c, heads, itemsize):
            if packed_multik_ok(sq, sk, c, heads, itemsize):
                return _flash_packed_multik(
                    q, k, v, heads=heads, scale=scale, kv_len=sk_real,
                    block_q=block_q, block_k=block_k, interpret=interpret)
            raise ValueError(
                f"packed kernel needs the key sequence in one VMEM block "
                f"(or multik-eligible geometry); sk={sk} c={c} too large "
                f"— use layout='bhsd'")
        if scale is None:
            scale = 1.0 / (d ** 0.5)
        qs = q * jnp.asarray(scale * LOG2E, q.dtype)
        # bq sweep (v5e, benchmarks/flash_layout_ab.py): 256 best at
        # sk=4096 (512+ blows VMEM on the fp32 logits), 512 at sk<=1024
        # — but only for narrow channels: at c=1280 (SDXL 16x, H=20) the
        # 512-wide q/out blocks + double-buffered kv exceed the 16 MB
        # VMEM scope (measured compile OOM), so wide-c shapes stay at 256.
        dbq = 512 if (sk <= 1024 and c <= 640) else 256
        bq = min(block_q or dbq, max(8, sq))
        bk = -(-max(sk, 128) // 128) * 128  # whole padded key seq
        q3 = _pad_to(qs, 1, bq)
        k3 = _pad_to(k, 1, bk)
        v3 = _pad_to(v, 1, bk)
        nq = q3.shape[1] // bq
        out = pl.pallas_call(
            functools.partial(
                _kernel_packed, sk_real=sk_real, block_k=bk, block_q=bq,
                heads=heads, d=d),
            grid=(b, nq, 1),
            in_specs=[
                pl.BlockSpec((1, bq, c), lambda g, i, j: (g, i, 0)),
                pl.BlockSpec((1, bk, c), lambda g, i, j: (g, j, 0)),
                pl.BlockSpec((1, bk, c), lambda g, i, j: (g, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, c), lambda g, i, j: (g, i, 0)),
            out_shape=jax.ShapeDtypeStruct(q3.shape, q.dtype),
            # Mosaic's default scoped-vmem limit is 16 MB; the packed
            # kernel's kv blocks + fp32 logits sit right at that edge
            # and the training-step compile (same shapes inside the
            # custom_vjp forward) measured 19.7 MB of stack. v5e has
            # 128 MB of physical VMEM — raise the cap for this kernel.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(q3, k3, v3)
        return out[:, :sq]

    *lead, sq, d = q.shape
    sk = k.shape[-2]
    sk_real = kv_len if kv_len is not None else sk
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    dbq, dbk = _default_blocks(sq, sk, d)
    if block_q is None:
        block_q = dbq
        if sq % dbq:
            # Prefer a q block that tiles sq EXACTLY (no q-pad copy + no
            # output unpad-slice): e.g. MMDiT's 4224-token pre-padded
            # joint sequence takes bq=384 (4224 = 11 x 384) instead of
            # padding 4224 -> 4352 for bq=256.
            for cand in (384, 192, 128):
                if sq % cand == 0 and cand <= 2 * dbq:
                    block_q = cand
                    break
    if block_k is None:
        block_k = dbk

    # Prescale q by scale*log2(e): the kernel's softmax then runs in
    # base 2 (exp2) with no per-logit scale multiply — one fewer full
    # (block_q, block_k) VPU pass per k block. The prescale itself touches
    # only the (Sq, d) q tensor and fuses into the surrounding program.
    q3 = (q * jnp.asarray(scale * LOG2E, q.dtype)).reshape(-1, sq, d)
    k3 = k.reshape(-1, sk, d)
    v3 = v.reshape(-1, sk, d)

    bq = min(block_q, max(8, sq))
    bk = min(block_k, max(128, sk))
    q3 = _pad_to(q3, 1, bq)
    k3 = _pad_to(k3, 1, bk)
    v3 = _pad_to(v3, 1, bk)
    nq = q3.shape[1] // bq
    nk = k3.shape[1] // bk

    # A transposed-logits ('t') kernel variant (logits (bk, bq), v^T@p,
    # targeting small head dims) was built and A/B'd in round 3; it lost
    # every measurement to this row layout (BASELINE.md: 1.353 vs
    # 1.147 ms at SD1.5 geometry) and was removed.
    kernel = functools.partial(
        _kernel, sk_real=sk_real, block_k=bk, causal=causal,
        block_q=bq, nk=nk,
    )
    scr = [
        pltpu.VMEM((bq, 1), jnp.float32),
        pltpu.VMEM((bq, 1), jnp.float32),
        pltpu.VMEM((bq, d), jnp.float32),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(q3.shape[0], nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, bk, d), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, bk, d), lambda g, i, j: (g, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda g, i, j: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q3.shape, q.dtype),
        scratch_shapes=scr,
        interpret=interpret,
    )(q3, k3, v3)

    out = out[:, :sq]
    return out.reshape(*lead, sq, d)
