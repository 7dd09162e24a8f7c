"""Stage-1 FreeGaussian model: deformable 3DGS forward pass + losses.

Functional equivalent of FreeGaussianModel.get_outputs / get_loss_dict /
get_metrics_dict (reference: freegaussian_model.py:753-990), with the same
schedules:
  - progressive downscale 2^max(num_downscales - step//resolution_schedule, 0)
  - SH degree schedule min(step // sh_degree_interval, sh_degree)
  - deform warm-up gate (step < warm_up -> canonical Gaussians)
  - background compositing rgb = render + (1 - alpha) * bg, clamp [0, 1]
  - RGB+ED expected depth with detached-max backfill
  - masked L1 + SSIM: (1 - l) * L1 + l * (1 - SSIM), optional scale reg
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..data.cameras import Camera
from ..ops.rasterize import rasterization
from ..ops.math import safe_norm
from .fields import ControlField, DeformField, apply_se3_deform
from .gaussians import GaussianParams, colors_from_features, num_alive
from .ssim import ssim


@dataclasses.dataclass(frozen=True)
class SplatConfig:
    """Static model configuration (mirrors FreeGaussianModelConfig defaults,
    freegaussian_model.py:51-131)."""

    warm_up: int = 3000
    num_downscales: int = 2
    resolution_schedule: int = 3000
    sh_degree: int = 3
    sh_degree_interval: int = 1000
    ssim_lambda: float = 0.2
    rasterize_mode: str = "classic"  # or "antialiased"
    background_color: str = "random"  # random | black | white
    use_scale_regularization: bool = False
    max_gauss_ratio: float = 10.0
    # Camera-pose optimization (nerfstudio CameraOptimizer; ref mode "off" at
    # freegaussian_model.py:120 but the optimizer group ships enabled,
    # freegaussian_config.py:76-81). "SO3xR3" enables per-camera tangents.
    camera_optimizer_mode: str = "off"  # off | SO3xR3
    # Per-image bilateral-grid ISP correction + TV loss
    # (ref: freegaussian_model.py:122-125, :879-882, :989)
    use_bilateral_grid: bool = False
    # bf16 trunk matmuls in the deform MLP (f32 master params + f32 heads);
    # ~2x on the v5e MXU, measured parity-safe for training quality.
    deform_bf16: bool = True
    # rematerialize the deform trunk in backward. With the r2-era f32 chain,
    # recompute beat storing (6.9 vs 5.8 ms at N=100k); with bf16 activations
    # + fused heads the balance flipped (r4 A/B: remat 15.73M px/s, stored
    # 16.53M — the (N, 256) bf16 activations cost less HBM than the
    # embedding+trunk recompute costs MXU/VPU). Default OFF since r4.
    deform_remat: bool = False
    # Deform/control trunk implementation on TPU (off-TPU always "flax"):
    #   "flax"   — the split-linear flax chain (positional_embed in-graph)
    #   "xla"    — dense selection-matmul embedding + padded bf16 chain:
    #              kills the lane-padded embed/concat without leaving XLA's
    #              fusion/layout world
    #   "pallas" — the fully fused VMEM-resident kernel (ops/mlp_pallas.py):
    #              wins STANDALONE (5.3 vs 5.8 ms fwd+bwd at N=100k) but its
    #              custom-call boundary flips XLA layouts in the full step.
    # Full-step A/B on v5e (tpu_checks stepab, one process): flax 12.18M px/s,
    # xla 10.88M, pallas 8.06M — in-step, XLA fuses the flax embedding into
    # the remat backward for free, so the standalone embed win never shows up.
    # xla/pallas remain for standalone/serving use (docs/NOTES_ROUND2.md).
    #   "headsfused" — flax trunk math with the four head projections as ONE
    #              (fan_in, 13) matmul: each head column is the same
    #              K-reduction, so outputs match flax bitwise, but four
    #              N=3|4 dots (2.5% MXU lane utilization) and their
    #              backward transposes collapse into one pass. r4 on-chip
    #              A/B: 15.71M vs 14.62M px/s (+7.5% step). DEFAULT.
    deform_impl: str = "headsfused"
    # jax.checkpoint policy for the remat'd deform chain: "" = save nothing
    # (recompute everything); "dots" = dots_with_no_batch_dims_saveable
    # (store matmul outputs, recompute only elementwise) — trades HBM
    # activation traffic back for the trunk's recompute FLOPs. A/B knob.
    deform_remat_policy: str = ""
    near_plane: float = 0.01
    far_plane: float = 1e10
    # 32 on TPU: intersections scale with tiles-per-Gaussian, and every
    # capacity-sized op (binning sort, gradient-reduction gathers, cumsum)
    # scales with intersections. The r3 on-chip A/B (docs/NOTES_ROUND3.md):
    # tile 16 = 11.2M px/s, tile 32 = 12.5M, tile 8 = 7.1M, tile 64 = VMEM
    # OOM (the (P, K) pixel blocks grow 4x per doubling). gsplat's CUDA
    # kernels keep 16 (one thread per pixel, one warp-block per tile — a
    # GPU-occupancy constraint the TPU grid doesn't have).
    tile_size: int = 32
    output_depth_during_training: bool = False
    backend: str = "auto"
    is_blender: bool = True
    # Flow-derivative supervision (reconstructed from the paper; the reference
    # defines the lift ops but never wires a loss — SURVEY §7 (d)).
    flow_loss_weight: float = 0.0  # rendered-2D-flow L1 vs interflow
    flow_3d_loss_weight: float = 0.0  # deform(t0) vs interflow-lifted 3D target
    # Resolution reference for the 2D flow loss. The loss is an L1 in PIXELS,
    # so its gradient scale grows linearly with resolution: the 0.01 weight
    # tuned on 128px scenes is effectively 5x stronger at 640px, which
    # destabilized the round-5 bench-resolution run (means/scales blown out
    # until the intersection workload exceeded the SMEM ceiling). When >0 the
    # effective 2D weight is flow_loss_weight * flow_px_ref / max(H, W) —
    # identical at max(H, W) == flow_px_ref, resolution-invariant elsewhere.
    # flow_3d is world-space and needs no normalization. 0 = raw pixel units
    # (legacy). The reference never wired these losses (SURVEY §2.1), so this
    # normalization is this repo's definition, set in configs/sim/base.yaml.
    flow_px_ref: float = 0.0
    # Init scale for the deform MLP's output heads. 1.0 = the reference's
    # torch-default init; near-zero (1e-4, set in configs/sim/base.yaml)
    # makes the deform warm-up flip identity-scale instead of a footprint
    # shock — see DeformField.head_init_scale for the full story.
    deform_head_init_scale: float = 1.0
    # Pallas tuning: chunk = intersections per kernel block; capacity factor
    # bounds intersections at factor * N (overflow drops deepest isects of the
    # largest Gaussians — raise it if isect counts approach the cap).
    # `isect_capacity` overrides with an ABSOLUTE slot count: the trainer sets
    # it from the live Gaussian count (factor * alive) so the sort/gather
    # pipeline is not sized by the padded capacity, and doubles it (re-jit)
    # when the measured num_isects approaches the cap.
    chunk: int = 128
    isect_capacity_factor: int = 6
    isect_capacity: Optional[int] = None
    # Exact opacity-aware binning radius (ops/rasterize.py:tighten_radii):
    # output-bit-identical, prunes zero-contribution intersections. Off only
    # for A/B runs.
    tight_radius: bool = True


def make_deform_field(cfg: SplatConfig) -> DeformField:
    import jax.numpy as _jnp

    return DeformField(
        is_blender=cfg.is_blender,
        compute_dtype=_jnp.bfloat16 if cfg.deform_bf16 else _jnp.float32,
        head_init_scale=cfg.deform_head_init_scale,
    )


def make_control_field(cfg: SplatConfig) -> ControlField:
    return ControlField()


def make_deform_apply(cfg: SplatConfig, field: DeformField):
    """The deform callable the trainers should pass into `forward`: the flax
    apply, or (on TPU, per cfg.deform_impl) the fused-Pallas or pure-XLA
    dense-embedding variant. The returned closure carries `.fused` when the
    backward already rematerializes (Pallas per-block remat) so `forward`
    can skip the outer jax.checkpoint."""
    import jax as _jax

    from .fields import deform_apply_fused

    on_tpu = _jax.devices()[0].platform == "tpu"
    impl = cfg.deform_impl if (on_tpu and cfg.deform_bf16) else "flax"
    if impl == "headsfused":
        from .fields import deform_apply_headsfused

        def apply(variables, x, t):
            return deform_apply_headsfused(field, variables, x, t)

        return apply
    if impl in ("pallas", "xla", "fused"):

        def apply(variables, x, t):
            return deform_apply_fused(field, variables, x, t, impl=impl)

        # the Pallas backwards remat per-block in VMEM; the XLA variant wants
        # the normal outer jax.checkpoint like the flax chain
        apply.fused = impl in ("pallas", "fused")
        return apply
    return field.apply


def make_control_apply(cfg: SplatConfig, field: ControlField):
    """Same policy for the stage-2 control field."""
    import jax as _jax

    from .fields import control_apply_fused

    on_tpu = _jax.devices()[0].platform == "tpu"
    impl = cfg.deform_impl if on_tpu else "flax"
    if impl == "headsfused":
        from .fields import control_apply_headsfused

        def apply(variables, x, value):
            return control_apply_headsfused(field, variables, x, value)

        return apply
    if impl in ("pallas", "xla"):

        def apply(variables, x, value):
            return control_apply_fused(field, variables, x, value, impl=impl)

        apply.fused = impl == "pallas"
        return apply
    return field.apply


def downscale_factor(cfg: SplatConfig, step: jax.Array | int, train: bool) -> int:
    """NOTE: returns a python int only when step is concrete; the train loop
    precomputes this outside jit so image shapes stay static per-phase."""
    if not train:
        return 1
    return int(2 ** max(cfg.num_downscales - int(step) // cfg.resolution_schedule, 0))


def sh_degree_to_use(cfg: SplatConfig, step: int) -> int:
    return min(step // cfg.sh_degree_interval, cfg.sh_degree)


def background_color(cfg: SplatConfig, rng: Optional[jax.Array], train: bool) -> jax.Array:
    if cfg.background_color == "random":
        if train and rng is not None:
            return jax.random.uniform(rng, (3,))
        # default viser background (ref: freegaussian_model.py:221-224)
        return jnp.asarray([0.1490, 0.1647, 0.2157])
    if cfg.background_color == "white":
        return jnp.ones(3)
    return jnp.zeros(3)


def forward(
    cfg: SplatConfig,
    params: GaussianParams,
    alive: jax.Array,
    camera: Camera,
    *,
    deform_variables: Optional[Any] = None,
    deform_apply=None,
    step: int = 0,
    sh_degree_now: Optional[int] = None,
    warmed_up: Optional[jax.Array] = None,
    train: bool = True,
    bg_rng: Optional[jax.Array] = None,
    means2d_sink: Optional[jax.Array] = None,
    render_mode: Optional[str] = None,
    camera0: Optional[Camera] = None,
    render_flow: bool = False,
    crop_box: Optional[jax.Array] = None,
    bilagrid: Optional[jax.Array] = None,
    image_idx: jax.Array | int = 0,
    primitive_shard_axis: Optional[str] = None,
    band_origin_y: jax.Array | int = 0,
    band_height: Optional[int] = None,
) -> Dict[str, jax.Array]:
    """Render one camera. Static args (image size via `camera.width/height`,
    sh degree, render mode) must be concrete; traced args (params, time,
    warmed_up gate) may be tracers.

    deform_apply(variables, means, times) -> (d_xyz (N,4,4), d_rot, d_scale)

    `primitive_shard_axis`: inside shard_map, run the per-Gaussian stage
    (deform MLP, projection, SH) on this chip's 1/ng slice of the capacity
    axis and all_gather the render attributes into the pixel stage — the
    projection(primitive-sharded) <-> rasterization(tile-sharded) reshard of
    SURVEY §2.3. Gradients reduce back to the shard via the gather's
    psum_scatter transpose; full-capacity outputs (radii/means2d/...) are
    returned gathered.
    """
    shard_factor = 1
    if primitive_shard_axis is not None:
        ax = primitive_shard_axis
        ng = jax.lax.axis_size(ax)
        idx = jax.lax.axis_index(ax)
        cap = params["means"].shape[0]
        assert cap % ng == 0, "capacity must divide the primitive shard axis"
        capl = cap // ng
        shard_factor = ng

        def take(a):
            return jax.lax.dynamic_slice_in_dim(a, idx * capl, capl, axis=0)

        params = {k: take(v) for k, v in params.items()}
        alive = take(alive)
        if means2d_sink is not None:
            means2d_sink = take(means2d_sink)

    means = params["means"]
    scales_log = params["scales"]
    quats = params["quats"]
    opacities = jax.nn.sigmoid(params["opacities"][..., 0])
    sh_coeffs = colors_from_features(params)
    if crop_box is not None:
        # (2, 3) axis-aligned box: the eval-time crop filter
        # (ref: freegaussian_model.py:779-799 crop_ids)
        inside = jnp.all((means >= crop_box[0]) & (means <= crop_box[1]), axis=-1)
        alive = alive & inside

    if render_mode is None:
        render_mode = "RGB+ED" if (cfg.output_depth_during_training or not train) else "RGB"
    if sh_degree_now is None:
        sh_degree_now = sh_degree_to_use(cfg, step)

    # Deformation (SE(3)) with warm-up gate. The gate is traced via
    # `warmed_up` so the jitted step handles both phases without recompiles.
    scales_lin = jnp.exp(scales_log)
    quats_n = quats / safe_norm(quats, axis=-1, keepdims=True)
    if (
        deform_apply is not None
        and cfg.deform_remat
        and not getattr(deform_apply, "fused", False)
    ):
        if cfg.deform_remat_policy == "dots":
            deform_apply = jax.checkpoint(
                deform_apply,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        else:
            deform_apply = jax.checkpoint(deform_apply)
    if deform_apply is not None and deform_variables is not None:
        times = camera.time.reshape(1, 1)  # shared frame time: broadcast inside
        d_xyz, d_rot, d_scale = deform_apply(
            deform_variables, jax.lax.stop_gradient(means), times
        )
        means_d = apply_se3_deform(means, d_xyz)
        scales_d = scales_lin + d_scale
        quats_d = quats_n + d_rot
        if warmed_up is None:
            warmed_up = jnp.asarray(step >= cfg.warm_up)
        gate = jnp.asarray(warmed_up, means.dtype)
        means = means + gate * (means_d - means)
        scales_lin = scales_lin + gate * (scales_d - scales_lin)
        quats_n = quats_n + gate * (quats_d - quats_n)

    # Flow-derivative path: deform at the paired frame's time, project through
    # the paired camera, composite per-Gaussian screen motion as channels.
    # (reconstructs the supervision the reference left unwired; SURVEY §7 (d))
    extra_channels = None
    means_prev = None
    if camera0 is not None and deform_apply is not None and deform_variables is not None:
        from ..ops.projection import project_gaussians

        times0 = camera0.time.reshape(1, 1)
        d_xyz0, _, _ = deform_apply(
            deform_variables, jax.lax.stop_gradient(params["means"]), times0
        )
        means_prev_d = apply_se3_deform(params["means"], d_xyz0)
        gate0 = jnp.asarray(warmed_up if warmed_up is not None else True, means.dtype)
        means_prev = params["means"] + gate0 * (means_prev_d - params["means"])
        if render_flow:
            proj_t = project_gaussians(
                means, quats_n, scales_lin, camera.viewmat, camera.K,
                camera.width, camera.height,
                near_plane=cfg.near_plane, far_plane=cfg.far_plane, alive=alive,
            )
            proj_0 = project_gaussians(
                means_prev, quats_n, scales_lin, camera0.viewmat, camera0.K,
                camera0.width, camera0.height,
                near_plane=cfg.near_plane, far_plane=cfg.far_plane, alive=alive,
            )
            extra_channels = proj_t.means2d - proj_0.means2d  # (N, 2) screen motion

    render, alpha, info = rasterization(
        means,
        quats_n,
        scales_lin,
        opacities,
        sh_coeffs,
        camera.viewmat[None],
        camera.K[None],
        camera.width,
        band_height if band_height is not None else camera.height,
        tile_size=cfg.tile_size,
        near_plane=cfg.near_plane,
        far_plane=cfg.far_plane,
        render_mode=render_mode,
        sh_degree=sh_degree_now,
        rasterize_mode=cfg.rasterize_mode,
        alive=alive,
        means2d_sink=means2d_sink,
        extra_channels=extra_channels,
        backend=cfg.backend,
        chunk=cfg.chunk,
        isect_capacity=(
            cfg.isect_capacity
            if cfg.isect_capacity is not None
            else cfg.isect_capacity_factor * params["means"].shape[0] * shard_factor
        ),
        tight_radius=cfg.tight_radius,
        gather_axis=primitive_shard_axis,
        tile_origin_y=band_origin_y,
        proj_height=camera.height if band_height is not None else None,
    )
    if primitive_shard_axis is not None and means_prev is not None:
        means_prev = jax.lax.all_gather(
            means_prev, primitive_shard_axis, axis=0, tiled=True
        )

    bg = background_color(cfg, bg_rng, train)
    rgb = render[0, ..., :3] + (1.0 - alpha[0]) * bg
    rgb = jnp.clip(rgb, 0.0, 1.0)
    if bilagrid is not None and train:
        # per-image ISP correction, training only (ref :879-882)
        from .bilagrid import slice_bilateral_grid

        rgb = slice_bilateral_grid(bilagrid, image_idx, rgb)

    out = {
        "rgb": rgb,
        "accumulation": alpha[0],
        "background": bg,
        "radii": info.radii,
        "means2d": info.means2d,
        "depths": info.depths,
        "num_isects": info.num_isects,
    }
    if extra_channels is not None:
        # Channel layout: [rgb(3), flow(2), depth?] — flow sits before ED.
        out["flow"] = render[0, ..., 3:5]
        out["means_prev"] = means_prev
        depth_ch = 5
    else:
        depth_ch = 3
    if means_prev is not None:
        out["means_prev"] = means_prev
    if render_mode == "RGB+ED":
        depth = render[0, ..., depth_ch : depth_ch + 1]
        # ref: unseen pixels get the detached max depth (freegaussian_model.py:886)
        depth = jnp.where(
            alpha[0] > 0, depth, jax.lax.stop_gradient(jnp.max(depth))
        )
        out["depth"] = depth
    return out


def loss_fn(
    cfg: SplatConfig,
    outputs: Dict[str, jax.Array],
    batch: Dict[str, jax.Array],
    params: GaussianParams,
    alive: jax.Array,
    *,
    apply_scale_reg: bool = False,
) -> Dict[str, jax.Array]:
    """Masked L1 + SSIM loss (+ optional PhysGaussian scale reg).

    (ref: freegaussian_model.py:944-990)
    """
    gt = batch["image"]
    if gt.shape[-1] == 4:
        a = gt[..., 3:4]
        gt = a * gt[..., :3] + (1 - a) * outputs["background"]
    pred = outputs["rgb"]
    if "mask" in batch and batch["mask"] is not None:
        mask = batch["mask"]
        gt = gt * mask
        pred = pred * mask
    l1 = jnp.mean(jnp.abs(gt - pred))
    simloss = 1.0 - ssim(gt, pred)
    main_loss = (1 - cfg.ssim_lambda) * l1 + cfg.ssim_lambda * simloss

    if cfg.use_scale_regularization:
        # `apply_scale_reg` is a traced array inside the jitted step (the
        # reference applies the reg every 10th step) — gate numerically, a
        # Python `if` on it would raise TracerBoolConversionError.
        scale_exp = jnp.exp(params["scales"])
        ratio = jnp.max(scale_exp, axis=-1) / jnp.clip(
            jnp.min(scale_exp, axis=-1), 1e-12, None
        )
        reg = jnp.maximum(ratio, cfg.max_gauss_ratio) - cfg.max_gauss_ratio
        reg_value = 0.1 * jnp.sum(reg * alive) / jnp.clip(num_alive(alive), 1, None)
        scale_reg = jnp.where(jnp.asarray(apply_scale_reg), reg_value, 0.0)
    else:
        scale_reg = jnp.asarray(0.0)

    return {"main_loss": main_loss, "scale_reg": scale_reg, "l1": l1, "ssim": 1 - simloss}


def psnr(pred: jax.Array, gt: jax.Array) -> jax.Array:
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.clip(mse, 1e-12, None))
