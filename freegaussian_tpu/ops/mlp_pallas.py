"""Fused Pallas TPU kernel for the 8x256 field-MLP trunk.

The deform/control trunks (models/fields.py, mirroring the reference
freegaussian_model.py:1054-1145) are a chain of eight (N, 256) x (256, 256)
matmuls with a skip concat after layer 4. Left to XLA, the chain runs ~4x off
MXU peak on v5e: every layer round-trips its (N, 256) activation through HBM,
and the cast / bias / relu epilogues fragment into separate fusions
(measured 4.5 ms fwd, 7.0 ms fwd+bwd at N=100k in bf16 —
docs/NOTES_ROUND2.md).

This kernel runs the whole trunk out of VMEM: the grid walks row-blocks of B
points; all eight weight matrices (~0.5 M params, bf16) stay VMEM-resident
across the grid, each block does 8 back-to-back MXU matmuls with in-register
relu, and only the block input (B, IN) and final activation (B, 256, bf16)
touch HBM. The custom-VJP backward recomputes the per-block activations in
VMEM (in-kernel rematerialization — cheaper than storing eight (N, 256)
arrays) and accumulates the weight gradients in f32 directly in the output
windows, which Mosaic keeps resident because their block index never changes
(flushed to HBM once, at grid end).

Numerics: matmuls take bf16 inputs with f32 accumulation
(preferred_element_type=f32), bias add + relu in f32, activations stored
bf16 — the same precision class as the flax bf16 path (TorchLinear with
compute_dtype=bf16), not bit-identical to it (the flax path rounds each
split-linear partial product and the accumulator to bf16; this kernel keeps
f32 accumulation, i.e. is slightly MORE accurate). Weight gradients
accumulate in f32.

Layout contract (fixed by models/fields.py):

    h = [x_emb, t_emb]                      # IN = E1 + E2 channels
    for i in range(8):
        h = relu(h @ W[i] + b[i])
        if i == 4:
            h = [x_emb, t_emb, h]           # skip: layer 5 sees IN + 256

The wrapper pads the concatenated input to IN_PAD = 128 lanes and the skip
weight's input rows to 128 + 256 = 384; padding rows/cols are zero so the
padded matmul equals the unpadded one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = 256  # trunk width (reference architecture)
DEPTH = 8
SKIP_AT = 4  # skip concat happens after this layer's relu
IN_PAD = 128  # padded input channels (E1 + E2 <= 128 for both fields)
BLOCK = 512  # default rows per grid step (override via fused_trunk(block=...))
# The forward runs a separate, larger row block: its VMEM need is tiny
# (keep=False holds ~2 activation buffers vs the backward's 8 remat buffers
# + f32 weight-grad accumulators), and the 8 sequential per-block matmuls
# are MXU-pipeline-latency bound — fewer, fatter blocks amortize it.
FWD_BLOCK_FACTOR = 4
FWD_BLOCK_MAX = 4096


def _fwd_block_for(block: int) -> int:
    fb = min(block * FWD_BLOCK_FACTOR, FWD_BLOCK_MAX)
    # the padded row count is a multiple of fb; fb must stay a multiple of
    # the backward block so both grids divide it
    return fb if fb % block == 0 else block


# grid-dim semantics for the forward kernel ("parallel" legal: disjoint output
# blocks, const weights). The backward needs "arbitrary" (weight-grad
# accumulators persist across steps). Knob for hardware A/B.
FWD_SEMANTICS = "arbitrary"

# Activation dtype INSIDE the kernels. bf16 was assumed optimal (halved VMEM
# traffic), but per-layer the two cast passes (f32 relu result -> bf16 store,
# bf16 load -> f32 epilogue) cost MORE VPU cycles than the matmul itself at
# these shapes ((B,256)x(256,256) = ~2.6 us MXU vs ~3 VPU passes over
# (B,256)). f32 activations skip every cast: the dot takes f32 operands at
# DEFAULT precision, which the MXU truncates to bf16 internally anyway (one
# pass) — same matmul numerics, no cast passes. A/B knob for hardware.
ACT_DTYPE = jnp.bfloat16


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mm(a, b):
    """a (M, K) x b (K, N) -> f32, bf16 MXU inputs.

    precision is pinned to DEFAULT explicitly: entry points set
    jax_default_matmul_precision="float32" globally, and Mosaic rejects a
    bf16-input matmul carrying the fp32 contract-precision attribute
    ("Bad lhs type" — fp32 precision means the 3-pass f32 split, which
    needs f32 inputs). bf16 in + f32 accumulate is exactly what we want."""
    return jax.lax.dot_general(
        a.astype(ACT_DTYPE),
        b.astype(ACT_DTYPE),
        ((((1,), (0,))), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _mm_tn(a, b):
    """a (K, M) x b (K, N) -> (M, N): contract dim 0 of both (wgrad shape)."""
    return jax.lax.dot_general(
        a.astype(ACT_DTYPE),
        b.astype(ACT_DTYPE),
        ((((0,), (0,))), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _mm_nt(a, b):
    """a (M, K) x b (N, K) -> (M, N): contract dim 1 of both (dgrad shape)."""
    return jax.lax.dot_general(
        a.astype(ACT_DTYPE),
        b.astype(ACT_DTYPE),
        ((((1,), (1,))), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _forward_acts(x, w, b, keep=True):
    """Forward through the trunk. With keep=True returns the post-relu bf16
    activation of every layer (backward remat); with keep=False only the
    final activation (forward kernel — avoids 8 live (B, 256) buffers).
    x: (B, IN_PAD) f32; w/b: weight & bias values (already read)."""
    acts = []
    h = None
    for i in range(DEPTH):
        if i == 0:
            z = _mm(x, w[0])
        elif i == SKIP_AT + 1:
            z = _mm(x, w[i][0:IN_PAD]) + _mm(h, w[i][IN_PAD : IN_PAD + H])
        else:
            z = _mm(h, w[i])
        h = jax.nn.relu(z + b[i]).astype(ACT_DTYPE)
        if keep:
            acts.append(h)
    return acts if keep else [h]


# -----------------------------------------------------------------------------
# forward kernel
# -----------------------------------------------------------------------------


def _fwd_kernel(inp_ref, *refs):
    w = [refs[i][...] for i in range(DEPTH)]  # bf16 weights
    b = [refs[DEPTH + i][...] for i in range(DEPTH)]  # f32 (1, H) biases
    out_ref = refs[2 * DEPTH]
    out_ref[...] = _forward_acts(inp_ref[...], w, b, keep=False)[-1]


# -----------------------------------------------------------------------------
# backward kernel
# -----------------------------------------------------------------------------


def _bwd_kernel(inp_ref, dh_ref, *refs):
    w = [refs[i][...] for i in range(DEPTH)]  # bf16 weights
    b = [refs[DEPTH + i][...] for i in range(DEPTH)]  # f32 (1, H) biases
    dinp_ref = refs[2 * DEPTH]
    dw_refs = refs[2 * DEPTH + 1 : 3 * DEPTH + 1]  # f32 accumulators
    db_refs = refs[3 * DEPTH + 1 : 4 * DEPTH + 1]  # f32 (1, H) accumulators
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        for r in (*dw_refs, *db_refs):
            r[...] = jnp.zeros(r.shape, r.dtype)

    x = inp_ref[...]  # (B, IN_PAD) f32
    acts = _forward_acts(x, w, b)  # in-kernel rematerialization

    g = dh_ref[...]  # (B, H) f32: cotangent of the final activation
    g_skip = None  # skip-path contribution to d inp
    for i in range(DEPTH - 1, -1, -1):
        # relu mask in f32 — Mosaic has no bf16 compare on v5e
        mask_src = acts[i] if ACT_DTYPE == jnp.float32 else acts[i].astype(jnp.float32)
        g = g * (mask_src > 0)  # dL/dz_i, f32
        db_refs[i][...] += jnp.sum(g, axis=0, keepdims=True)
        if i == 0:
            dw_refs[0][...] += _mm_tn(x, g)
            dinp_ref[...] = _mm_nt(g, w[0]) + g_skip
        elif i == SKIP_AT + 1:
            dw_refs[i][0:IN_PAD] += _mm_tn(x, g)
            dw_refs[i][IN_PAD : IN_PAD + H] += _mm_tn(acts[i - 1], g)
            g_skip = _mm_nt(g, w[i][0:IN_PAD])
            g = _mm_nt(g, w[i][IN_PAD : IN_PAD + H])
        else:
            dw_refs[i][...] += _mm_tn(acts[i - 1], g)
            g = _mm_nt(g, w[i])


# -----------------------------------------------------------------------------
# custom VJP wrapper (operates on pre-padded shapes; padding in fused_trunk)
# -----------------------------------------------------------------------------


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda s: tuple(0 for _ in shape))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_trunk(interpret: bool, block: int, inp, ws, bs):
    return _fused_trunk_fwd(interpret, block, inp, ws, bs)[0]


def _pallas_fwd(interpret, block, inp, ws_bf16, bs2d):
    n = inp.shape[0]
    block = _fwd_block_for(block)
    in_specs = [pl.BlockSpec((block, IN_PAD), lambda s: (s, 0))]
    in_specs += [_const_spec(w.shape) for w in ws_bf16]
    in_specs += [_const_spec(b.shape) for b in bs2d]
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n // block,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, H), lambda s: (s, 0)),
        out_shape=jax.ShapeDtypeStruct((n, H), ACT_DTYPE),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(FWD_SEMANTICS,)
        ),
        interpret=interpret,
    )(inp, *ws_bf16, *bs2d)


def _fused_trunk_fwd(interpret, block, inp, ws, bs):
    ws_bf16 = tuple(w.astype(ACT_DTYPE) for w in ws)
    bs2d = tuple(b.reshape(1, H).astype(jnp.float32) for b in bs)
    h = _pallas_fwd(interpret, block, inp, ws_bf16, bs2d)
    return h, (inp, ws_bf16, bs2d)


def _fused_trunk_bwd(interpret, block, res, dh):
    inp, ws_bf16, bs2d = res
    n = inp.shape[0]
    dh = dh.astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((block, IN_PAD), lambda s: (s, 0)),
        pl.BlockSpec((block, H), lambda s: (s, 0)),
    ]
    in_specs += [_const_spec(w.shape) for w in ws_bf16]
    in_specs += [_const_spec(b.shape) for b in bs2d]

    out_specs = [pl.BlockSpec((block, IN_PAD), lambda s: (s, 0))]
    out_shapes = [jax.ShapeDtypeStruct((n, IN_PAD), jnp.float32)]
    for w in ws_bf16:
        out_specs.append(_const_spec(w.shape))
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
    for b in bs2d:
        out_specs.append(_const_spec(b.shape))
        out_shapes.append(jax.ShapeDtypeStruct(b.shape, jnp.float32))

    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(n // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(inp, dh, *ws_bf16, *bs2d)

    dinp = outs[0]
    dws = tuple(outs[1 : 1 + DEPTH])
    dbs = tuple(o.reshape(H) for o in outs[1 + DEPTH :])
    return dinp, dws, dbs


_fused_trunk.defvjp(_fused_trunk_fwd, _fused_trunk_bwd)


# -----------------------------------------------------------------------------
# public entry
# -----------------------------------------------------------------------------


def fused_trunk(
    x_emb: jax.Array, t_emb: jax.Array, ws, bs, *, interpret=None, block=None
):
    """Run the 8x256 trunk on (x_emb, t_emb) -> (N, 256) f32 activations.

    x_emb: (N, E1) f32; t_emb: (N, E2) or (1, E2) (broadcast); ws/bs: the
    eight trunk kernels/biases in flax layout — ws[0]: (E1+E2, H),
    ws[SKIP_AT+1]: (E1+E2+H, H), others (H, H). Differentiable in all of
    x_emb, t_emb (broadcast transposes to a sum), ws, bs.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu",)
    if block is None:
        block = BLOCK
    n = x_emb.shape[0]
    e1 = x_emb.shape[-1]
    e2 = t_emb.shape[-1]
    ein = e1 + e2
    if ein > IN_PAD:
        raise ValueError(f"trunk input width {ein} exceeds IN_PAD={IN_PAD}")
    if ws[0].shape != (ein, H) or ws[SKIP_AT + 1].shape != (ein + H, H):
        raise ValueError("trunk weight shapes do not match embeddings")

    t_full = jnp.broadcast_to(t_emb, (n, e2))
    inp = jnp.concatenate(
        [x_emb, t_full, jnp.zeros((n, IN_PAD - ein), x_emb.dtype)], axis=-1
    ).astype(jnp.float32)

    ws = list(ws)
    # pad W0's rows to IN_PAD; split W5's rows into [input | pad | hidden]
    ws[0] = jnp.concatenate(
        [ws[0], jnp.zeros((IN_PAD - ein, H), ws[0].dtype)], axis=0
    )
    w5 = ws[SKIP_AT + 1]
    ws[SKIP_AT + 1] = jnp.concatenate(
        [w5[:ein], jnp.zeros((IN_PAD - ein, H), w5.dtype), w5[ein:]], axis=0
    )

    n_pad = _round_up(max(n, block), _fwd_block_for(block))
    if n_pad != n:
        inp = jnp.concatenate(
            [inp, jnp.zeros((n_pad - n, IN_PAD), inp.dtype)], axis=0
        )

    h = _fused_trunk(bool(interpret), int(block), inp, tuple(ws), tuple(bs))
    return h[:n].astype(jnp.float32)


def xla_deform_trunk(x, t_emb, ws, bs, *, num_freqs=10):
    """Pure-XLA twin of `fused_deform_trunk`: the NeRF embedding as ONE dense
    (N, 16) @ (16, 128) f32 matmul + per-lane {id, sin, cos} select (no
    21-piece lane-padded concat — that cost 5.1 ms at N=100k), then the
    bf16 trunk chain on the lane-full (N, 128) input with IN_PAD-padded
    weights. Unlike the Pallas kernel this stays inside XLA's fusion/layout
    world, so it composes with the surrounding train step without the
    custom-call layout flips (docs/NOTES_ROUND2.md). Shared-frame t_emb
    (1, E2) rides a broadcast row added onto its lanes."""
    n = x.shape[0]
    e2 = t_emb.shape[-1]
    S, kind, width = _field_layout(num_freqs, sources=1)
    ein = width + e2
    if ws[0].shape != (ein, H) or ws[SKIP_AT + 1].shape != (ein + H, H):
        raise ValueError("trunk weight shapes do not match embedding layout")
    trow = jnp.zeros((1, 128), jnp.float32)
    trow = jax.lax.dynamic_update_slice(
        trow, t_emb.astype(jnp.float32), (0, width)
    )
    xsrc = jnp.concatenate(
        [x.astype(jnp.float32), jnp.zeros((n, XSRC - 3), jnp.float32)], axis=-1
    )
    emb, _ = _embed(xsrc, S, kind, trow)  # (N, 128) f32, lane-full
    ws_p = _pad_trunk_weights(tuple(w.astype(ACT_DTYPE) for w in ws), ein)
    h = emb
    for i in range(DEPTH):
        if i == 0:
            z = _mm(emb, ws_p[0])
        elif i == SKIP_AT + 1:
            z = _mm(emb, ws_p[i][0:IN_PAD]) + _mm(h, ws_p[i][IN_PAD:])
        else:
            z = _mm(h, ws_p[i])
        h = jax.nn.relu(z + bs[i].astype(jnp.float32)).astype(jnp.bfloat16)
    return h.astype(jnp.float32)


def xla_control_trunk(x, value, ws, bs, *, num_freqs=10):
    """Pure-XLA twin of `fused_control_trunk`: both embeddings via the dense
    selection matmul; value is per-point (N, 3) or broadcast (1, 3)."""
    n = x.shape[0]
    S, kind, width = _field_layout(num_freqs, sources=2)
    ein = 2 * width
    if ws[0].shape != (ein, H) or ws[SKIP_AT + 1].shape != (ein + H, H):
        raise ValueError("trunk weight shapes do not match embedding layout")
    value_full = jnp.broadcast_to(value, (n, value.shape[-1]))
    pad5 = jnp.zeros((n, 8 - 3), jnp.float32)
    xsrc = jnp.concatenate(
        [x.astype(jnp.float32), pad5, value_full.astype(jnp.float32), pad5],
        axis=-1,
    )
    emb, _ = _embed(xsrc, S, kind, jnp.zeros((1, 128), jnp.float32))
    ws_p = _pad_trunk_weights(tuple(w.astype(ACT_DTYPE) for w in ws), ein)
    h = emb
    for i in range(DEPTH):
        if i == 0:
            z = _mm(emb, ws_p[0])
        elif i == SKIP_AT + 1:
            z = _mm(emb, ws_p[i][0:IN_PAD]) + _mm(h, ws_p[i][IN_PAD:])
        else:
            z = _mm(h, ws_p[i])
        h = jax.nn.relu(z + bs[i].astype(jnp.float32)).astype(jnp.bfloat16)
    return h.astype(jnp.float32)


def reference_trunk(x_emb, t_emb, ws, bs):
    """Slow-but-obvious f32 jnp equivalent: the parity oracle for tests."""
    n = x_emb.shape[0]
    t_full = jnp.broadcast_to(t_emb, (n, t_emb.shape[-1]))
    inp = jnp.concatenate([x_emb, t_full], axis=-1).astype(jnp.float32)
    h = inp
    for i in range(DEPTH):
        h = jax.nn.relu(h @ ws[i] + bs[i])
        if i == SKIP_AT:
            h = jnp.concatenate([inp, h], axis=-1)
    return h


# -----------------------------------------------------------------------------
# In-kernel positional embedding ("field" variant)
#
# Profiling the composed deform apply on v5e showed the NeRF embedding
# dominating the graph: positional_embed builds 21 lane-padded (N, 3) pieces
# and concatenates them (3.6 ms of sin/cos fusions + 1.5 ms of concatenate at
# N=100k — docs/NOTES_ROUND2.md), dwarfing the 0.6 ms trunk kernel. Here the
# embedding moves inside the kernel: the raw (N, <=6) coordinates enter as a
# (B, 16) block, one tiny HIGHEST-precision matmul against a constant
# "selection" matrix S (16, 128) replicates each component to its embedding
# lanes scaled by its frequency, and a per-lane `kind` row selects
# {identity, sin, cos}. Lane order equals positional_embed's concat order
# ([v, sin(2^0 v), cos(2^0 v), sin(2^1 v), ...] interleaved by component),
# so the flax W0/W5 parameter layouts are reused unchanged. A broadcast
# `trow` (1, 128) carries the shared time embedding (deform: timenet output)
# added onto its lanes.
# -----------------------------------------------------------------------------

XSRC = 16  # padded source-coordinate lanes (<= 2 sources x 8)


def _field_layout(num_freqs: int, sources: int):
    """Selection matrix / kind row for `sources` 3-vector inputs, each
    embedded to 3 * (1 + 2 * num_freqs) lanes. Source s lives in xsrc
    sublanes [8s, 8s+3). Returns (S (16, 128) f32, kind (1, 128) f32,
    per-source lane width)."""
    import numpy as np

    width = 3 * (1 + 2 * num_freqs)
    S = np.zeros((XSRC, 128), np.float32)
    kind = np.zeros((1, 128), np.float32)
    for s in range(sources):
        lane = s * width
        for blk in range(1 + 2 * num_freqs):
            if blk == 0:
                f, kd = 1.0, 0.0
            else:
                f = float(2.0 ** ((blk - 1) // 2))
                kd = 1.0 if blk % 2 == 1 else 2.0
            for c in range(3):
                S[8 * s + c, lane] = f
                kind[0, lane] = kd
                lane += 1
    return jnp.asarray(S), jnp.asarray(kind), width


def _dot_f32(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _embed(x16, S, kind, trow):
    """(B, 16) coords -> (B, 128) f32 embedding lanes (+ broadcast trow)."""
    scaled = _dot_f32(x16, S, ((1,), (0,)))
    emb = jnp.where(
        kind == 1.0, jnp.sin(scaled), jnp.where(kind == 2.0, jnp.cos(scaled), scaled)
    )
    return emb + trow, scaled


def _field_fwd_kernel(x_ref, S_ref, kind_ref, trow_ref, *refs):
    w = [refs[i][...] for i in range(DEPTH)]
    b = [refs[DEPTH + i][...] for i in range(DEPTH)]
    out_ref = refs[2 * DEPTH]
    emb, _ = _embed(x_ref[...], S_ref[...], kind_ref[...], trow_ref[...])
    out_ref[...] = _forward_acts(emb, w, b, keep=False)[-1]


def _field_bwd_kernel(x_ref, dh_ref, S_ref, kind_ref, trow_ref, *refs):
    w = [refs[i][...] for i in range(DEPTH)]
    b = [refs[DEPTH + i][...] for i in range(DEPTH)]
    dx_ref = refs[2 * DEPTH]
    dw_refs = refs[2 * DEPTH + 1 : 3 * DEPTH + 1]
    db_refs = refs[3 * DEPTH + 1 : 4 * DEPTH + 1]
    dtrow_ref = refs[4 * DEPTH + 1]
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        for r in (*dw_refs, *db_refs, dtrow_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    S = S_ref[...]
    kind = kind_ref[...]
    emb, scaled = _embed(x_ref[...], S, kind, trow_ref[...])
    acts = _forward_acts(emb, w, b)  # in-kernel rematerialization

    g = dh_ref[...]
    g_skip = None
    d_emb = None
    for i in range(DEPTH - 1, -1, -1):
        mask_src = acts[i] if ACT_DTYPE == jnp.float32 else acts[i].astype(jnp.float32)
        g = g * (mask_src > 0)
        db_refs[i][...] += jnp.sum(g, axis=0, keepdims=True)
        if i == 0:
            dw_refs[0][...] += _mm_tn(emb, g)
            d_emb = _mm_nt(g, w[0]) + g_skip
        elif i == SKIP_AT + 1:
            dw_refs[i][0:IN_PAD] += _mm_tn(emb, g)
            dw_refs[i][IN_PAD : IN_PAD + H] += _mm_tn(acts[i - 1], g)
            g_skip = _mm_nt(g, w[i][0:IN_PAD])
            g = _mm_nt(g, w[i][IN_PAD : IN_PAD + H])
        else:
            dw_refs[i][...] += _mm_tn(acts[i - 1], g)
            g = _mm_nt(g, w[i])

    dtrow_ref[...] += jnp.sum(d_emb, axis=0, keepdims=True)
    d_scaled = (
        jnp.where(
            kind == 1.0,
            jnp.cos(scaled),
            jnp.where(kind == 2.0, -jnp.sin(scaled), 1.0),
        )
        * d_emb
    )
    dx_ref[...] = _dot_f32(d_scaled, S, ((1,), (1,)))


HEAD_LANES = 16  # packed head-output lanes (deform: 3+3+4+3 = 13 used)


def _field_fwd_kernel_heads(x_ref, S_ref, kind_ref, trow_ref, *refs):
    """Heads-folded forward: trunk + one packed (H, 16) head matmul, so the
    (B, 256) activations never leave VMEM — the kernel emits only the 13
    packed head outputs (w|v|rotation|scaling for the deform field)."""
    w = [refs[i][...] for i in range(DEPTH)]
    b = [refs[DEPTH + i][...] for i in range(DEPTH)]
    hw = refs[2 * DEPTH][...]
    hb = refs[2 * DEPTH + 1][...]
    out_ref = refs[2 * DEPTH + 2]
    emb, _ = _embed(x_ref[...], S_ref[...], kind_ref[...], trow_ref[...])
    h = _forward_acts(emb, w, b, keep=False)[-1]
    # Heads at f32/HIGHEST (ADVICE r3): w/v/theta form the SE3 screw axis
    # (later divided by theta), so the tiny (H, 16) head matmul runs at full
    # precision to match the impls that compute heads in f32 outside the
    # trunk. Cost is negligible next to the trunk's 8 (B, 256) matmuls.
    out_ref[...] = _dot_f32(h.astype(jnp.float32), hw, ((1,), (0,))) + hb


def _field_bwd_kernel_heads(x_ref, dy_ref, S_ref, kind_ref, trow_ref, *refs):
    w = [refs[i][...] for i in range(DEPTH)]
    b = [refs[DEPTH + i][...] for i in range(DEPTH)]
    hw = refs[2 * DEPTH][...]
    dx_ref = refs[2 * DEPTH + 1]
    dw_refs = refs[2 * DEPTH + 2 : 3 * DEPTH + 2]
    db_refs = refs[3 * DEPTH + 2 : 4 * DEPTH + 2]
    dhw_ref = refs[4 * DEPTH + 2]
    dhb_ref = refs[4 * DEPTH + 3]
    dtrow_ref = refs[4 * DEPTH + 4]
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        for r in (*dw_refs, *db_refs, dhw_ref, dhb_ref, dtrow_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    S = S_ref[...]
    kind = kind_ref[...]
    emb, scaled = _embed(x_ref[...], S, kind, trow_ref[...])
    acts = _forward_acts(emb, w, b)  # in-kernel rematerialization

    dy = dy_ref[...]  # (B, HEAD_LANES) f32
    dhb_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    # f32/HIGHEST head grads to mirror the forward's f32 heads (ADVICE r3).
    dhw_ref[...] += _dot_f32(acts[-1].astype(jnp.float32), dy, ((0,), (0,)))
    g = _dot_f32(dy, hw, ((1,), (1,)))  # (B, H)
    g_skip = None
    d_emb = None
    for i in range(DEPTH - 1, -1, -1):
        mask_src = acts[i] if ACT_DTYPE == jnp.float32 else acts[i].astype(jnp.float32)
        g = g * (mask_src > 0)
        db_refs[i][...] += jnp.sum(g, axis=0, keepdims=True)
        if i == 0:
            dw_refs[0][...] += _mm_tn(emb, g)
            d_emb = _mm_nt(g, w[0]) + g_skip
        elif i == SKIP_AT + 1:
            dw_refs[i][0:IN_PAD] += _mm_tn(emb, g)
            dw_refs[i][IN_PAD : IN_PAD + H] += _mm_tn(acts[i - 1], g)
            g_skip = _mm_nt(g, w[i][0:IN_PAD])
            g = _mm_nt(g, w[i][IN_PAD : IN_PAD + H])
        else:
            dw_refs[i][...] += _mm_tn(acts[i - 1], g)
            g = _mm_nt(g, w[i])

    dtrow_ref[...] += jnp.sum(d_emb, axis=0, keepdims=True)
    d_scaled = (
        jnp.where(
            kind == 1.0,
            jnp.cos(scaled),
            jnp.where(kind == 2.0, -jnp.sin(scaled), 1.0),
        )
        * d_emb
    )
    dx_ref[...] = _dot_f32(d_scaled, S, ((1,), (1,)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_field_heads(interpret: bool, block: int, xsrc, S, kind, trow, ws, bs, hw, hb):
    return _fused_field_heads_fwd(
        interpret, block, xsrc, S, kind, trow, ws, bs, hw, hb
    )[0]


def _fused_field_heads_fwd(interpret, block, xsrc, S, kind, trow, ws, bs, hw, hb):
    n = xsrc.shape[0]
    ws_bf16 = tuple(w.astype(ACT_DTYPE) for w in ws)
    bs2d = tuple(b.reshape(1, H).astype(jnp.float32) for b in bs)
    hw_c = hw.astype(jnp.float32)  # heads stay f32 (ADVICE r3): SE3 screw axis
    hb2d = hb.reshape(1, HEAD_LANES).astype(jnp.float32)
    fblock = _fwd_block_for(block)
    in_specs = [pl.BlockSpec((fblock, XSRC), lambda s: (s, 0))]
    in_specs += [_const_spec(a.shape) for a in (S, kind, trow)]
    in_specs += [_const_spec(w.shape) for w in ws_bf16]
    in_specs += [_const_spec(b.shape) for b in bs2d]
    in_specs += [_const_spec(hw_c.shape), _const_spec(hb2d.shape)]
    y = pl.pallas_call(
        _field_fwd_kernel_heads,
        grid=(n // fblock,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((fblock, HEAD_LANES), lambda s: (s, 0)),
        out_shape=jax.ShapeDtypeStruct((n, HEAD_LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(FWD_SEMANTICS,)
        ),
        interpret=interpret,
    )(xsrc, S, kind, trow, *ws_bf16, *bs2d, hw_c, hb2d)
    return y, (xsrc, S, kind, trow, ws_bf16, bs2d, hw_c)


def _fused_field_heads_bwd(interpret, block, res, dy):
    xsrc, S, kind, trow, ws_bf16, bs2d, hw_c = res
    n = xsrc.shape[0]
    dy = dy.astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((block, XSRC), lambda s: (s, 0)),
        pl.BlockSpec((block, HEAD_LANES), lambda s: (s, 0)),
    ]
    in_specs += [_const_spec(a.shape) for a in (S, kind, trow)]
    in_specs += [_const_spec(w.shape) for w in ws_bf16]
    in_specs += [_const_spec(b.shape) for b in bs2d]
    in_specs += [_const_spec(hw_c.shape)]

    out_specs = [pl.BlockSpec((block, XSRC), lambda s: (s, 0))]
    out_shapes = [jax.ShapeDtypeStruct((n, XSRC), jnp.float32)]
    for w in ws_bf16:
        out_specs.append(_const_spec(w.shape))
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
    for b in bs2d:
        out_specs.append(_const_spec(b.shape))
        out_shapes.append(jax.ShapeDtypeStruct(b.shape, jnp.float32))
    out_specs += [_const_spec(hw_c.shape), _const_spec((1, HEAD_LANES))]
    out_shapes += [
        jax.ShapeDtypeStruct(hw_c.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, HEAD_LANES), jnp.float32),
    ]
    out_specs.append(_const_spec(trow.shape))
    out_shapes.append(jax.ShapeDtypeStruct(trow.shape, jnp.float32))

    outs = pl.pallas_call(
        _field_bwd_kernel_heads,
        grid=(n // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xsrc, dy, S, kind, trow, *ws_bf16, *bs2d, hw_c)

    dxsrc = outs[0]
    dws = tuple(outs[1 : 1 + DEPTH])
    dbs = tuple(o.reshape(H) for o in outs[1 + DEPTH : 1 + 2 * DEPTH])
    dhw = outs[1 + 2 * DEPTH]
    dhb = outs[2 + 2 * DEPTH].reshape(HEAD_LANES)
    dtrow = outs[3 + 2 * DEPTH]
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return dxsrc, f0(S), f0(kind), dtrow, dws, dbs, dhw, dhb


_fused_field_heads.defvjp(_fused_field_heads_fwd, _fused_field_heads_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_field(interpret: bool, block: int, xsrc, S, kind, trow, ws, bs):
    return _fused_field_fwd(interpret, block, xsrc, S, kind, trow, ws, bs)[0]


def _fused_field_fwd(interpret, block, xsrc, S, kind, trow, ws, bs):
    n = xsrc.shape[0]
    ws_bf16 = tuple(w.astype(ACT_DTYPE) for w in ws)
    bs2d = tuple(b.reshape(1, H).astype(jnp.float32) for b in bs)
    fblock = _fwd_block_for(block)
    in_specs = [pl.BlockSpec((fblock, XSRC), lambda s: (s, 0))]
    in_specs += [_const_spec(a.shape) for a in (S, kind, trow)]
    in_specs += [_const_spec(w.shape) for w in ws_bf16]
    in_specs += [_const_spec(b.shape) for b in bs2d]
    h = pl.pallas_call(
        _field_fwd_kernel,
        grid=(n // fblock,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((fblock, H), lambda s: (s, 0)),
        out_shape=jax.ShapeDtypeStruct((n, H), ACT_DTYPE),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(FWD_SEMANTICS,)
        ),
        interpret=interpret,
    )(xsrc, S, kind, trow, *ws_bf16, *bs2d)
    return h, (xsrc, S, kind, trow, ws_bf16, bs2d)


def _fused_field_bwd(interpret, block, res, dh):
    xsrc, S, kind, trow, ws_bf16, bs2d = res
    n = xsrc.shape[0]
    dh = dh.astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((block, XSRC), lambda s: (s, 0)),
        pl.BlockSpec((block, H), lambda s: (s, 0)),
    ]
    in_specs += [_const_spec(a.shape) for a in (S, kind, trow)]
    in_specs += [_const_spec(w.shape) for w in ws_bf16]
    in_specs += [_const_spec(b.shape) for b in bs2d]

    out_specs = [pl.BlockSpec((block, XSRC), lambda s: (s, 0))]
    out_shapes = [jax.ShapeDtypeStruct((n, XSRC), jnp.float32)]
    for w in ws_bf16:
        out_specs.append(_const_spec(w.shape))
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
    for b in bs2d:
        out_specs.append(_const_spec(b.shape))
        out_shapes.append(jax.ShapeDtypeStruct(b.shape, jnp.float32))
    out_specs.append(_const_spec(trow.shape))
    out_shapes.append(jax.ShapeDtypeStruct(trow.shape, jnp.float32))

    outs = pl.pallas_call(
        _field_bwd_kernel,
        grid=(n // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xsrc, dh, S, kind, trow, *ws_bf16, *bs2d)

    dxsrc = outs[0]
    dws = tuple(outs[1 : 1 + DEPTH])
    dbs = tuple(o.reshape(H) for o in outs[1 + DEPTH : 1 + 2 * DEPTH])
    dtrow = outs[1 + 2 * DEPTH]
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return dxsrc, f0(S), f0(kind), dtrow, dws, dbs


_fused_field.defvjp(_fused_field_fwd, _fused_field_bwd)


def _pad_trunk_weights(ws, ein):
    ws = list(ws)
    ws[0] = jnp.concatenate(
        [ws[0], jnp.zeros((IN_PAD - ein, H), ws[0].dtype)], axis=0
    )
    w5 = ws[SKIP_AT + 1]
    ws[SKIP_AT + 1] = jnp.concatenate(
        [w5[:ein], jnp.zeros((IN_PAD - ein, H), w5.dtype), w5[ein:]], axis=0
    )
    return tuple(ws)


def _pad_rows(a, n_pad):
    n = a.shape[0]
    if n_pad == n:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((n_pad - n,) + a.shape[1:], a.dtype)], axis=0
    )


def fused_deform_trunk(
    x: jax.Array, t_emb: jax.Array, ws, bs, *, num_freqs=10,
    interpret=None, block=None,
):
    """Trunk on [positional_embed(x, num_freqs) | broadcast t_emb] with the
    embedding computed in-kernel. x: (N, 3); t_emb: (1, E2) shared row (the
    deform timenet output). Differentiable in x, t_emb, ws, bs."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu",)
    if block is None:
        block = BLOCK
    n = x.shape[0]
    e2 = t_emb.shape[-1]
    S, kind, width = _field_layout(num_freqs, sources=1)
    ein = width + e2
    if ws[0].shape != (ein, H) or ws[SKIP_AT + 1].shape != (ein + H, H):
        raise ValueError("trunk weight shapes do not match embedding layout")
    trow = jnp.zeros((1, 128), jnp.float32)
    trow = jax.lax.dynamic_update_slice(
        trow, t_emb.astype(jnp.float32), (0, width)
    )
    xsrc = jnp.concatenate(
        [x.astype(jnp.float32), jnp.zeros((n, XSRC - 3), jnp.float32)], axis=-1
    )
    n_pad = _round_up(max(n, block), _fwd_block_for(block))
    h = _fused_field(
        bool(interpret), int(block), _pad_rows(xsrc, n_pad), S, kind, trow,
        _pad_trunk_weights(ws, ein), tuple(bs),
    )
    return h[:n].astype(jnp.float32)


def fused_deform_full(
    x: jax.Array, t_emb: jax.Array, ws, bs, head_ws, head_bs, *, num_freqs=10,
    interpret=None, block=None,
):
    """Whole deform field in ONE kernel pair: in-kernel embedding, trunk,
    and the four packed (256 -> 3|3|4|3) heads — the (N, 256) activations
    never touch HBM (the plain trunk kernel lost in-step to exactly that
    round-trip + the heads' XLA glue, docs/NOTES_ROUND3.md). Returns the
    (N, 13) packed head outputs [w|v|rotation|scaling]; callers slice.
    Differentiable in x, t_emb, trunk and head parameters."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu",)
    if block is None:
        block = BLOCK
    n = x.shape[0]
    e2 = t_emb.shape[-1]
    S, kind, width = _field_layout(num_freqs, sources=1)
    ein = width + e2
    if ws[0].shape != (ein, H) or ws[SKIP_AT + 1].shape != (ein + H, H):
        raise ValueError("trunk weight shapes do not match embedding layout")
    widths = [hw.shape[-1] for hw in head_ws]
    used = sum(widths)
    if used > HEAD_LANES:
        raise ValueError(f"packed head outputs {used} exceed {HEAD_LANES}")
    hw = jnp.concatenate(
        list(head_ws) + [jnp.zeros((H, HEAD_LANES - used), head_ws[0].dtype)],
        axis=-1,
    )
    hb = jnp.concatenate(
        list(head_bs) + [jnp.zeros((HEAD_LANES - used,), head_bs[0].dtype)]
    )
    trow = jnp.zeros((1, 128), jnp.float32)
    trow = jax.lax.dynamic_update_slice(
        trow, t_emb.astype(jnp.float32), (0, width)
    )
    xsrc = jnp.concatenate(
        [x.astype(jnp.float32), jnp.zeros((n, XSRC - 3), jnp.float32)], axis=-1
    )
    n_pad = _round_up(max(n, block), _fwd_block_for(block))
    y = _fused_field_heads(
        bool(interpret), int(block), _pad_rows(xsrc, n_pad), S, kind, trow,
        _pad_trunk_weights(ws, ein), tuple(bs), hw, hb,
    )
    return y[:n, :used]


def fused_control_trunk(
    x: jax.Array, value: jax.Array, ws, bs, *, num_freqs=10,
    interpret=None, block=None,
):
    """Trunk on [positional_embed(x) | positional_embed(value)] with both
    embeddings in-kernel. x, value: (N, 3). Differentiable in all inputs."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu",)
    if block is None:
        block = BLOCK
    n = x.shape[0]
    S, kind, width = _field_layout(num_freqs, sources=2)
    ein = 2 * width
    if ws[0].shape != (ein, H) or ws[SKIP_AT + 1].shape != (ein + H, H):
        raise ValueError("trunk weight shapes do not match embedding layout")
    pad5 = jnp.zeros((n, 8 - 3), jnp.float32)
    xsrc = jnp.concatenate(
        [x.astype(jnp.float32), pad5, value.astype(jnp.float32), pad5], axis=-1
    )
    trow = jnp.zeros((1, 128), jnp.float32)
    n_pad = _round_up(max(n, block), _fwd_block_for(block))
    h = _fused_field(
        bool(interpret), int(block), _pad_rows(xsrc, n_pad), S, kind, trow,
        _pad_trunk_weights(ws, ein), tuple(bs),
    )
    return h[:n].astype(jnp.float32)
