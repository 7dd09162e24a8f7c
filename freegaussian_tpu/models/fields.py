"""Deformation and control field MLPs (flax), matching the reference
architectures (freegaussian_model.py:1054-1145):

- FreeGaussianDeformableModel: time-conditioned SE(3) field. Positional enc
  (10 freqs xyz -> 63ch; 6 freqs t for blender data routed through a small
  `timenet`), 8x256 MLP with a skip connection after layer 4, heads producing
  a screw axis (w, v) -> exp_se3 per-Gaussian 4x4 transform, plus d_rotation
  (4) and d_scaling (3).
- FreeGaussianControllableModel: (xyz emb 63, control-state emb 63) -> same
  trunk -> d_xyz (3), d_rot (4), d_scale (3).

The MLP is a chain of (N, 256) x (256, 256) matmuls — the per-step hot loop
after rasterization; it maps straight onto the MXU. Weight init mimics torch
nn.Linear defaults (kaiming-uniform a=sqrt(5), bias U(+-1/sqrt(fan_in))) so
training dynamics track the reference.
"""

from __future__ import annotations

import functools
import math
from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.math import exp_se3, positional_embed, safe_norm


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    flax kernels are (fan_in, fan_out).
    """
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """Linear layer with torch-default init.

    Accepts either one input or a LIST of inputs whose feature dims sum to
    fan_in: the kernel is sliced per input and the partial products summed —
    mathematically `concat(inputs) @ kernel` without materializing the concat
    (XLA concatenates are a top cost in the deform MLP on TPU, and their
    backward adds splits/copies). Parameter layout is unchanged, so torch
    checkpoints import identically.

    `compute_dtype=bfloat16` casts inputs and kernel to bf16 for the matmul
    (MXU-native; measured ~2x on v5e) while keeping f32 master params and a
    f32 accumulate via preferred_element_type."""

    features: int
    compute_dtype: Any = jnp.float32
    # Multiplies BOTH the kernel and bias init (torch-default otherwise).
    # Near-zero (e.g. 1e-4) makes the layer's output ~identity-scale at init
    # — used for the deform output heads so the warm-up flip is a no-op
    # instead of a footprint shock (see DeformField.head_init_scale).
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        inputs = x if isinstance(x, (list, tuple)) else [x]
        fan_in = sum(i.shape[-1] for i in inputs)
        bound = 1.0 / math.sqrt(fan_in)
        s = self.init_scale
        kernel = self.param(
            "kernel",
            (torch_linear_kernel_init if s == 1.0 else
             lambda k, sh, dt=jnp.float32: s * torch_linear_kernel_init(k, sh, dt)),
            (fan_in, self.features),
        )
        bias = self.param(
            "bias",
            lambda key, shape, dtype=jnp.float32: s * jax.random.uniform(
                key, shape, dtype, -bound, bound
            ),
            (self.features,),
        )
        ct = self.compute_dtype
        out = None
        offset = 0
        for inp in inputs:
            d = inp.shape[-1]
            part = jnp.dot(
                inp.astype(ct),
                kernel[offset : offset + d].astype(ct),
                preferred_element_type=ct,
            )
            out = part if out is None else out + part
            offset += d
        return out + bias.astype(ct)


class DeformField(nn.Module):
    """SE(3) deformation field. (ref: freegaussian_model.py:1054-1114)

    `compute_dtype=bfloat16` runs the trunk matmuls/activations in bf16 (the
    round-2 perf mode; ~2x on the v5e MXU) with f32 master params; the heads
    always compute in f32 so the SE(3) deltas keep full precision."""

    depth: int = 8
    width: int = 256
    multires: int = 10
    is_blender: bool = True  # reference instantiates with is_blender=True (:198)
    compute_dtype: Any = jnp.float32
    # Init scale for the four OUTPUT heads (w/v/rotation/scaling). The
    # reference keeps torch-default init on the heads (freegaussian_model.py
    # :1086-1089), so at the warm-up flip an untrained head applies ~U(+-0.06)
    # bias offsets to every Gaussian — ~6 deg rotations and additive d_scale
    # that inflate screen footprints ~100x for one transient phase. On CUDA
    # that's survivable waste; at the TPU SMEM intersection ceiling it drops
    # >90% of intersections and training never recovers (640px runs,
    # docs/QUALITY_R5.md). A near-zero head init (deformable-NeRF practice,
    # e.g. Nerfies' zero-init final layers) makes the flip exactly
    # identity-scale; the SE(3) form forbids EXACT zero (theta = |w| is a
    # divisor), so a tiny scale is used instead. 1.0 = reference-faithful.
    head_init_scale: float = 1.0

    @nn.compact
    def __call__(self, x, t):
        """x: (N, 3) canonical means; t: (N, 1) or (1, 1) times (a (1, 1)
        time — one shared frame time — runs the time branch once and
        broadcasts, which is the common training case).

        Returns (d_xyz SE3Screw, d_rotation (N, 4), d_scaling (N, 3)).
        """
        ct = self.compute_dtype
        t_multires = 6 if self.is_blender else 10
        t_emb = positional_embed(t, t_multires)
        if self.is_blender:
            t_emb = TorchLinear(256, compute_dtype=ct)(t_emb)
            t_emb = nn.relu(t_emb)
            t_emb = TorchLinear(30, compute_dtype=ct)(t_emb)
        t_emb = jnp.broadcast_to(t_emb, (x.shape[0], t_emb.shape[-1]))
        x_emb = positional_embed(x, self.multires)
        if ct != jnp.float32:
            x_emb = x_emb.astype(ct)
            t_emb = t_emb.astype(ct)

        skip_at = self.depth // 2
        h = [x_emb, t_emb]  # concat-free split-linear inputs
        for i in range(self.depth):
            h = TorchLinear(self.width, compute_dtype=ct)(h)
            h = nn.relu(h)
            if i == skip_at:
                h = [x_emb, t_emb, h]

        # heads in f32: SE(3) deltas keep full precision
        if not isinstance(h, (list, tuple)):
            h = [h]
        h = [a.astype(jnp.float32) for a in h]
        his = self.head_init_scale
        w = TorchLinear(3, init_scale=his)(h)
        v = TorchLinear(3, init_scale=his)(h)
        theta = safe_norm(w, axis=-1, keepdims=True)
        # Reference quirk kept verbatim: the 1e-5 is added after the division.
        w = w / theta + 1e-5
        v = v / theta + 1e-5
        d_xyz = SE3Screw(w=w, v=v, theta=theta)
        rotation = TorchLinear(4, init_scale=his)(h)
        scaling = TorchLinear(3, init_scale=his)(h)
        return d_xyz, rotation, scaling


class ControlField(nn.Module):
    """Control field mapping (position, control state) to per-Gaussian deltas.

    (ref: freegaussian_model.py:1117-1145)
    """

    depth: int = 8
    width: int = 256
    multires: int = 10

    @nn.compact
    def __call__(self, x, value):
        """x: (N, 3); value: (N, 3) blended control state. Returns
        (d_xyz (N, 3), d_rot (N, 4), d_scale (N, 3))."""
        value_emb = positional_embed(value, self.multires)
        x_emb = positional_embed(x, self.multires)
        skip_at = self.depth // 2
        h = [x_emb, value_emb]  # concat-free split-linear inputs
        for i in range(self.depth):
            h = TorchLinear(self.width)(h)
            h = nn.relu(h)
            if i == skip_at:
                h = [x_emb, value_emb, h]
        d_xyz = TorchLinear(3)(h)
        d_rot = TorchLinear(4)(h)
        d_scale = TorchLinear(3)(h)
        return d_xyz, d_rot, d_scale


def deform_apply_fused(
    field: DeformField, variables, x, t, *, interpret=None, block=None,
    impl="pallas",
):
    """`field.apply(variables, x, t)` with the trunk routed through the fused
    Pallas MLP kernel (ops/mlp_pallas.py), or with impl="xla" through its
    pure-XLA twin (dense selection-matmul embedding + bf16 chain — no
    custom-call boundary, so it composes with the full train step without
    layout-flip copies; docs/NOTES_ROUND2.md). Same parameter tree, same
    outputs; the trunk computes in the bf16-matmul/f32-accumulate class
    instead of the flax bf16 chain (slightly MORE accurate — f32
    accumulators). The timenet and the f32 heads (including the reference's
    `/theta + 1e-5` precedence quirk, freegaussian_model.py:1109-1111)
    replicate DeformField.__call__ exactly; tests/test_mlp_pallas.py pins
    the paths together."""
    from ..ops.mlp_pallas import fused_trunk

    p = variables["params"]
    ct = field.compute_dtype
    t_multires = 6 if field.is_blender else 10
    t_emb = positional_embed(t, t_multires)
    idx = 0
    if field.is_blender:
        k0, k1 = p["TorchLinear_0"], p["TorchLinear_1"]
        t_emb = nn.relu(
            jnp.dot(
                t_emb.astype(ct), k0["kernel"].astype(ct), preferred_element_type=ct
            )
            + k0["bias"].astype(ct)
        )
        t_emb = (
            jnp.dot(
                t_emb.astype(ct), k1["kernel"].astype(ct), preferred_element_type=ct
            )
            + k1["bias"].astype(ct)
        )
        idx = 2
    ws = tuple(p[f"TorchLinear_{idx + i}"]["kernel"] for i in range(field.depth))
    bs = tuple(p[f"TorchLinear_{idx + i}"]["bias"] for i in range(field.depth))
    if t_emb.shape[0] == 1 and impl == "fused":
        # Whole field in one kernel pair: trunk + the four packed heads —
        # the (N, 256) activations never leave VMEM (mlp_pallas
        # fused_deform_full); only the 13 packed head outputs cross HBM.
        from ..ops.mlp_pallas import fused_deform_full

        hp_ = idx + field.depth
        heads_ = [p[f"TorchLinear_{hp_ + j}"] for j in range(4)]
        y = fused_deform_full(
            x, t_emb.astype(jnp.float32), ws, bs,
            [hh["kernel"] for hh in heads_], [hh["bias"] for hh in heads_],
            num_freqs=field.multires, interpret=interpret, block=block,
        )
        w = y[:, 0:3]
        v = y[:, 3:6]
        rotation = y[:, 6:10]
        scaling = y[:, 10:13]
        theta = safe_norm(w, axis=-1, keepdims=True)
        w = w / theta + 1e-5
        v = v / theta + 1e-5
        return SE3Screw(w=w, v=v, theta=theta), rotation, scaling
    if t_emb.shape[0] == 1 and impl == "xla":
        from ..ops.mlp_pallas import xla_deform_trunk

        h = xla_deform_trunk(
            x, t_emb.astype(jnp.float32), ws, bs, num_freqs=field.multires
        )
    elif t_emb.shape[0] == 1:
        # Shared frame time (the training hot path): x's positional embedding
        # moves inside the kernel (fused_deform_trunk) — building it in-graph
        # cost more than the whole trunk (3.6 ms of sin/cos fusions + 1.5 ms
        # concatenate at N=100k on v5e, docs/NOTES_ROUND2.md).
        from ..ops.mlp_pallas import fused_deform_trunk

        h = fused_deform_trunk(
            x, t_emb.astype(jnp.float32), ws, bs,
            num_freqs=field.multires, interpret=interpret, block=block,
        )
    else:
        from ..ops.mlp_pallas import fused_trunk

        x_emb = positional_embed(x, field.multires)
        h = fused_trunk(
            x_emb, t_emb.astype(jnp.float32), ws, bs,
            interpret=interpret, block=block,
        )

    hp = idx + field.depth
    heads = [p[f"TorchLinear_{hp + j}"] for j in range(4)]

    def head(j):
        return h @ heads[j]["kernel"] + heads[j]["bias"]

    w = head(0)
    v = head(1)
    theta = safe_norm(w, axis=-1, keepdims=True)
    # Reference quirk kept verbatim: the 1e-5 is added after the division.
    w = w / theta + 1e-5
    v = v / theta + 1e-5
    d_xyz = SE3Screw(w=w, v=v, theta=theta)
    rotation = head(2)
    scaling = head(3)
    return d_xyz, rotation, scaling


# Deform/control trunk linear backward: False = plain autodiff (XLA emits
# the dx+db pair as dual-output "convolution" fusions that run ~2.4x slower
# than a clean MXU matmul at the bench point — fusion.814/.818/.820 in
# docs/NOTES_ROUND5.md); True = custom_vjp with explicit dot_generals
# (dx = g W^T, dW = x^T g, db = sum g), numerically the same dots, forward
# bitwise-identical (same primal code path). A/B knob for hardware.
SPLIT_LINEAR_VJP = False


def _split_linear(inputs, kernel, bias, ct):
    """TorchLinear's list-input math on a raw param dict: per-input kernel
    row-slices, partial products summed — bitwise the module's own chain."""
    if not isinstance(inputs, (list, tuple)):
        inputs = [inputs]
    if SPLIT_LINEAR_VJP:
        return _split_linear_cvjp(jnp.dtype(ct).name, tuple(inputs), kernel, bias)
    return _split_linear_fwd_math(tuple(inputs), kernel, bias, ct)


def _split_linear_fwd_math(inputs, kernel, bias, ct):
    out = None
    offset = 0
    for inp in inputs:
        d = inp.shape[-1]
        part = jnp.dot(
            inp.astype(ct),
            kernel[offset : offset + d].astype(ct),
            preferred_element_type=ct,
        )
        out = part if out is None else out + part
        offset += d
    return out + bias.astype(ct)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _split_linear_cvjp(ctname, inputs, kernel, bias):
    return _split_linear_fwd_math(inputs, kernel, bias, jnp.dtype(ctname))


def _split_linear_cvjp_fwd(ctname, inputs, kernel, bias):
    out = _split_linear_fwd_math(inputs, kernel, bias, jnp.dtype(ctname))
    return out, (inputs, kernel)


def _split_linear_cvjp_bwd(ctname, res, g):
    ct = jnp.dtype(ctname)
    inputs, kernel = res
    bdt = kernel.dtype
    d_inputs = []
    d_kparts = []
    offset = 0
    for inp in inputs:
        d = inp.shape[-1]
        # dW_j = x_j^T g: contract the batch dim directly (no physical
        # transpose); the MXU accumulates f32 internally, output f32 = the
        # kernel cotangent dtype.
        d_kparts.append(
            jax.lax.dot_general(
                inp.astype(ct), g,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(kernel.dtype)
        )
        # dx_j = g W_j^T: contract the out dim against the kernel row slice
        d_inputs.append(
            jax.lax.dot_general(
                g, kernel[offset : offset + d].astype(ct),
                (((1,), (1,)), ((), ())),
                preferred_element_type=ct,
            ).astype(inp.dtype)
        )
        offset += d
    kernel_ct = jnp.concatenate(d_kparts, axis=0)
    d_bias = jnp.sum(g.astype(jnp.float32), axis=0).astype(bdt)
    return tuple(d_inputs), kernel_ct, d_bias


_split_linear_cvjp.defvjp(_split_linear_cvjp_fwd, _split_linear_cvjp_bwd)


def deform_apply_headsfused(field: DeformField, variables, x, t):
    """`field.apply(variables, x, t)` with the four head projections computed
    as ONE (fan_in, 13) matmul instead of four skinny (fan_in, 3|4) dots.

    Each head output column is the same K-reduction whether or not other
    columns share the dot, so results match the flax module bit-for-bit
    (tests/test_mlp_pallas.py pins it); the win is MXU lane utilization —
    an N=3 dot pads to 128 lanes, so four of them (plus their dW/dx
    transposes in the backward) run at ~2.5% utilization where one N=13 dot
    does the same work in one pass. Parameter tree unchanged (torch-ckpt
    import parity, engine/optimizers grouping)."""
    p = variables["params"]
    ct = field.compute_dtype
    t_multires = 6 if field.is_blender else 10
    t_emb = positional_embed(t, t_multires)
    idx = 0
    if field.is_blender:
        t_emb = nn.relu(
            _split_linear([t_emb], p["TorchLinear_0"]["kernel"],
                          p["TorchLinear_0"]["bias"], ct)
        )
        t_emb = _split_linear(
            [t_emb], p["TorchLinear_1"]["kernel"], p["TorchLinear_1"]["bias"], ct
        )
        idx = 2
    t_emb = jnp.broadcast_to(t_emb, (x.shape[0], t_emb.shape[-1]))
    x_emb = positional_embed(x, field.multires)
    if ct != jnp.float32:
        x_emb = x_emb.astype(ct)
        t_emb = t_emb.astype(ct)

    skip_at = field.depth // 2
    h = [x_emb, t_emb]
    for i in range(field.depth):
        kp = p[f"TorchLinear_{idx + i}"]
        h = nn.relu(_split_linear(h, kp["kernel"], kp["bias"], ct))
        if i == skip_at:
            h = [x_emb, t_emb, h]
    if not isinstance(h, (list, tuple)):
        h = [h]
    h = [a.astype(jnp.float32) for a in h]

    hp = idx + field.depth
    heads = [p[f"TorchLinear_{hp + j}"] for j in range(4)]
    k_all = jnp.concatenate([hh["kernel"] for hh in heads], axis=1)  # (f, 13)
    b_all = jnp.concatenate([hh["bias"] for hh in heads], axis=0)
    y = _split_linear(h, k_all, b_all, jnp.float32)  # (N, 13) f32
    w = y[:, 0:3]
    v = y[:, 3:6]
    rotation = y[:, 6:10]
    scaling = y[:, 10:13]
    theta = safe_norm(w, axis=-1, keepdims=True)
    # Reference quirk kept verbatim: the 1e-5 is added after the division.
    w = w / theta + 1e-5
    v = v / theta + 1e-5
    return SE3Screw(w=w, v=v, theta=theta), rotation, scaling


def control_apply_headsfused(field: ControlField, variables, x, value):
    """`field.apply(variables, x, value)` with the three head projections as
    ONE (fan_in, 10) matmul — the stage-2 twin of deform_apply_headsfused
    (same column-independence argument: outputs match flax bitwise)."""
    p = variables["params"]
    value_full = jnp.broadcast_to(value, (x.shape[0], value.shape[-1]))
    value_emb = positional_embed(value_full, field.multires)
    x_emb = positional_embed(x, field.multires)
    skip_at = field.depth // 2
    h = [x_emb, value_emb]
    for i in range(field.depth):
        kp = p[f"TorchLinear_{i}"]
        h = nn.relu(_split_linear(h, kp["kernel"], kp["bias"], jnp.float32))
        if i == skip_at:
            h = [x_emb, value_emb, h]
    if not isinstance(h, (list, tuple)):
        h = [h]
    heads = [p[f"TorchLinear_{field.depth + j}"] for j in range(3)]
    k_all = jnp.concatenate([hh["kernel"] for hh in heads], axis=1)  # (f, 10)
    b_all = jnp.concatenate([hh["bias"] for hh in heads], axis=0)
    y = _split_linear(h, k_all, b_all, jnp.float32)
    return y[:, 0:3], y[:, 3:7], y[:, 7:10]


def control_apply_fused(
    field: ControlField, variables, x, value, *, interpret=None, block=None,
    impl="pallas",
):
    """`ControlField.apply` with the trunk on the fused Pallas MLP kernel
    (or, impl="xla", its pure-XLA dense-embedding twin). The stage-2 control
    trunk is architecturally identical to the deform trunk (value_emb
    replaces t_emb, per-point); heads stay f32 outside."""
    from ..ops.mlp_pallas import fused_control_trunk, xla_control_trunk

    p = variables["params"]
    ws = tuple(p[f"TorchLinear_{i}"]["kernel"] for i in range(field.depth))
    bs = tuple(p[f"TorchLinear_{i}"]["bias"] for i in range(field.depth))
    value_full = jnp.broadcast_to(value, (x.shape[0], value.shape[-1]))
    if impl == "xla":
        h = xla_control_trunk(
            x, value_full, ws, bs, num_freqs=field.multires
        )
    else:
        h = fused_control_trunk(
            x, value_full, ws, bs,
            num_freqs=field.multires, interpret=interpret, block=block,
        )
    heads = [p[f"TorchLinear_{field.depth + j}"] for j in range(3)]

    def head(j):
        return h @ heads[j]["kernel"] + heads[j]["bias"]

    return head(0), head(1), head(2)


def apply_se3_deform(means: jax.Array, d_xyz) -> jax.Array:
    """means' = dehomog(d_xyz @ homog(means)). (ref: freegaussian_model.py:843)

    d_xyz is either an (N, 4, 4) matrix stack or an SE3Screw. The screw path
    is the TPU-fast one: it never materializes (N, 4, 4) / (N, 3, 3) arrays
    (whose 3/4-wide trailing dims pad to 128 lanes and waste ~40x VPU
    throughput) — everything is cross-product chains on (N,) channels.
    """
    if isinstance(d_xyz, SE3Screw):
        return d_xyz.apply(means)
    homog = jnp.concatenate([means, jnp.ones_like(means[..., :1])], axis=-1)
    out = jnp.einsum("nij,nj->ni", d_xyz, homog)
    return out[..., :3] / out[..., 3:4]


class SE3Screw(NamedTuple):
    """Screw-axis SE(3) transform in channelized form: w, v (N, 3) and
    theta (N, 1). Equivalent to exp_se3(concat(w, v), theta) (Modern Robotics
    3.88; ref utils.py:137-159) without building matrices:

      R m = m + sin(th) (w x m) + (1 - cos(th)) (w x (w x m))
      p   = th v + (1 - cos(th)) (w x v) + (th - sin(th)) (w x (w x v))
    """

    w: jax.Array
    v: jax.Array
    theta: jax.Array

    def apply(self, means: jax.Array) -> jax.Array:
        wx, wy, wz = self.w[:, 0], self.w[:, 1], self.w[:, 2]
        vx, vy, vz = self.v[:, 0], self.v[:, 1], self.v[:, 2]
        mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
        th = self.theta[:, 0]
        s = jnp.sin(th)
        c1 = 1.0 - jnp.cos(th)
        ts = th - s

        def cross(ax, ay, az, bx, by, bz):
            return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)

        # R m
        c1x, c1y, c1z = cross(wx, wy, wz, mx, my, mz)
        c2x, c2y, c2z = cross(wx, wy, wz, c1x, c1y, c1z)
        rx = mx + s * c1x + c1 * c2x
        ry = my + s * c1y + c1 * c2y
        rz = mz + s * c1z + c1 * c2z
        # p
        d1x, d1y, d1z = cross(wx, wy, wz, vx, vy, vz)
        d2x, d2y, d2z = cross(wx, wy, wz, d1x, d1y, d1z)
        px = th * vx + c1 * d1x + ts * d2x
        py = th * vy + c1 * d1y + ts * d2y
        pz = th * vz + c1 * d1z + ts * d2z
        return jnp.stack([rx + px, ry + py, rz + pz], axis=-1)

    def matrix(self) -> jax.Array:
        """(N, 4, 4) matrices (compatibility / tests)."""
        screw = jnp.concatenate([self.w, self.v], axis=-1)
        return exp_se3(screw, self.theta)
