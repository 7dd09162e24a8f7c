"""Trainer: the training-loop shell replacing the nerfstudio Trainer layer
(SURVEY L2). Owns setup (data -> Gaussians -> optimizers -> jitted steps),
the step loop with the reference's schedules (progressive downscale phases,
SH-degree schedule, eval/save cadence), checkpointing via orbax, and metric
logging (psnr / loss / gaussian_count / rays-per-sec — the same fields the
reference instruments, freegaussian_pipeline.py:128-156)."""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cameras import Camera
from ..data.datamanager import FullImageDatamanager
from ..data.dataparsers import PARSERS, ParsedDataset
from ..models.densify import DensifyConfig, DensifyState
from ..models.fields import ControlField, DeformField
from ..models.gaussians import init_gaussians
from ..models.splat_model import SplatConfig, forward, psnr, sh_degree_to_use
from ..models.ssim import ssim
from .checkpoints import load_checkpoint, save_checkpoint
from .optimizers import OptimizersConfig, init_opt_states, make_optimizers
from .train_step import GAUSSIAN_GROUPS, TrainState, make_train_step

_quality_metrics = jax.jit(lambda rgb, gt: (psnr(rgb, gt), ssim(rgb, gt)))


@dataclasses.dataclass
class TrainerConfig:
    data: str = ""
    dataparser: str = "synthetic"
    output_dir: str = "outputs"
    experiment_name: str = "freegaussian"
    max_num_iterations: int = 30000
    steps_per_save: int = 2000
    steps_per_eval_image: int = 100
    steps_per_eval_all_images: int = 1000
    eval_all_max_images: Optional[int] = None
    """cap on images per in-training eval_all sweep (None = whole split)"""
    steps_per_log: int = 10
    halt_on_nan: bool = True
    """stop training with a diagnostic when the logged loss goes non-finite
    (a poisoned state never recovers: every gradient of a NaN loss is NaN, so
    continuing just burns the remaining step budget — the round-2 collapse
    trained 500+ steps on NaN params before eval noticed)"""
    eval_dump_dir: str = ""
    """when set, in-training eval_all sweeps also write gt|pred side-by-side
    PNGs here (the reference's eval image dumps, freegaussian_pipeline.py:144)"""
    vis: str = ""
    """metric sinks: "" (jsonl only), "tensorboard" (also event files), or
    "viewer+tensorboard" (also the live HTTP orbit viewer) — mirroring the
    reference's `vis:` config key"""
    viewer_port: int = 7007
    scan_chunk: int = 0
    """> 1: run training in device-side lax.scan chunks of up to this many
    steps (one host dispatch per chunk). Semantically equivalent to the
    per-step loop (same frame order, same step math — tested), but the
    tunneled TPU backend pays one ~100-300 ms host round trip per DISPATCH,
    which dominates small-scene training. Chunks break at downscale/SH phase
    changes and at every eval/save cadence point; in-chunk metrics are
    returned stacked and logged at the steps_per_log cadence afterwards.
    Keep it a divisor of the cadences to minimize distinct compile shapes."""
    capacity: int = 1 << 19
    num_random: int = 50000
    """random-init Gaussian count when the dataset has no seed points"""
    seed: int = 42
    splat: SplatConfig = dataclasses.field(default_factory=SplatConfig)
    densify: DensifyConfig = dataclasses.field(default_factory=DensifyConfig)
    optimizers: OptimizersConfig = dataclasses.field(default_factory=OptimizersConfig)
    dataparser_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)


def downscale_phase(cfg: SplatConfig, step: int) -> int:
    return int(2 ** max(cfg.num_downscales - step // cfg.resolution_schedule, 0))


class Trainer:
    def __init__(self, config: TrainerConfig, parsed: Optional[ParsedDataset] = None):
        # On TPU, default-precision f32 matmuls (incl. reductions XLA
        # pattern-matches into dots, e.g. MSE sums) truncate inputs to bf16;
        # train/eval metrics must be f32-exact. Explicit bf16 paths (deform
        # trunk) pass bf16 inputs and are unaffected by this default.
        jax.config.update("jax_default_matmul_precision", "float32")
        self.config = config
        key = jax.random.PRNGKey(config.seed)
        k_init, k_deform, k_control, k_state = jax.random.split(key, 4)

        if parsed is None:
            parser = PARSERS[config.dataparser]
            parsed = parser(Path(config.data), "train", **config.dataparser_kwargs)
            try:
                self.eval_parsed = parser(
                    Path(config.data), "val", **config.dataparser_kwargs
                )
            except Exception:
                self.eval_parsed = None
        else:
            self.eval_parsed = None
        self.parsed = parsed
        self.datamanager = FullImageDatamanager(parsed, seed=config.seed)
        self.eval_datamanager = (
            FullImageDatamanager(self.eval_parsed) if self.eval_parsed else None
        )

        params, alive = init_gaussians(
            k_init,
            config.capacity,
            seed_points=parsed.seed_points,
            num_random=min(config.num_random, config.capacity // 2),
            sh_degree=config.splat.sh_degree,
        )
        from ..models.splat_model import make_deform_apply, make_deform_field

        self.deform = make_deform_field(config.splat)
        self.deform_apply = make_deform_apply(config.splat, self.deform)
        # deform_head_init_scale is applied at INIT TIME inside DeformField
        # (fields.py TorchLinear.init_scale) so every consumer — Trainer,
        # bench, graft entry — gets the softened heads, not just this path.
        # (The round-3 post-init rescale that lived here double-applied the
        # factor once the field-level init landed; removed in round 5.)
        deform_vars = self.deform.init(k_deform, jnp.zeros((1, 3)), jnp.zeros((1, 1)))
        self.control = ControlField()
        from ..models.splat_model import make_control_apply

        self.control_apply = make_control_apply(config.splat, self.control)
        control_vars = self.control.init(
            k_control, jnp.zeros((1, 3)), jnp.zeros((1, 3))
        )

        self._isect_shrinks = 0
        self._isect_low_streak = 0
        if config.splat.isect_capacity is None:
            # Size the intersection pipeline off the LIVE Gaussian count, not
            # the padded capacity (6x 2^19 slots would make every sort/gather
            # ~10x larger than needed at 50k alive); _maybe_grow_isect_capacity
            # doubles it when measured num_isects approaches the cap.
            n_alive0 = max(int(jnp.sum(alive)), 1)
            cap0 = max(config.splat.isect_capacity_factor * n_alive0, 1 << 14)
            config = dataclasses.replace(
                config,
                splat=dataclasses.replace(config.splat, isect_capacity=cap0),
            )
            self.config = config

        camera_opt = None
        if config.splat.camera_optimizer_mode != "off":
            from ..models.camera_opt import init_camera_opt

            camera_opt = init_camera_opt(len(self.datamanager))
        bilagrid = None
        if config.splat.use_bilateral_grid:
            from ..models.bilagrid import init_bilateral_grids

            bilagrid = init_bilateral_grids(len(self.datamanager))

        self.optimizers = make_optimizers(config.optimizers)
        params_by_group = {k: params[k] for k in GAUSSIAN_GROUPS}
        params_by_group["deform"] = deform_vars
        params_by_group["control"] = control_vars
        if camera_opt is not None:
            params_by_group["camera_opt"] = camera_opt
        if bilagrid is not None:
            params_by_group["bilateral_grid"] = bilagrid
        opt_states = init_opt_states(self.optimizers, params_by_group)

        self.state = TrainState(
            params=params,
            alive=alive,
            deform_vars=deform_vars,
            control_vars=control_vars,
            opt_states=opt_states,
            densify=DensifyState.create(config.capacity),
            step=jnp.asarray(0),
            key=k_state,
            camera_opt=camera_opt,
            bilagrid=bilagrid,
        )
        self._rebuild_step_fn()
        self.out_dir = Path(config.output_dir) / config.experiment_name
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.metrics_log = self.out_dir / "metrics.jsonl"
        self.tb_writer = None
        if "tensorboard" in config.vis:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb_writer = SummaryWriter(str(self.out_dir / "tb"))
            except Exception as e:  # noqa: BLE001
                import warnings

                warnings.warn(f"tensorboard writer unavailable: {e}")
        # `vis: viewer` starts lazily at train() time, not here: subclass
        # state the render_fn needs (ControlTrainer.gaussian_mask) is only
        # assigned after this __init__ returns.
        self._viewer = None

    # ------------------------------------------------------------------
    def _eval_render(self):
        """Cached JITTED inference forward -> rgb. Eager dispatch is the
        enemy on the tunneled chip (~30 s per op first time, a host round
        trip after); one jit makes eval throughput track the train forward.
        Re-traces automatically per (width, height) — static Camera aux —
        and is rebuilt when the config object changes (capacity growth)."""
        cfg = self.config
        if getattr(self, "_eval_render_cfg", None) is not cfg:
            deform_apply = self.deform_apply

            @jax.jit
            def render(params, alive, dvars, camera, warmed):
                return forward(
                    cfg.splat,
                    params,
                    alive,
                    camera,
                    deform_variables=dvars,
                    deform_apply=deform_apply,
                    sh_degree_now=cfg.splat.sh_degree,
                    warmed_up=warmed,
                    train=False,
                )["rgb"]

            self._eval_render_cache = render
            self._eval_render_cfg = cfg
        return self._eval_render_cache

    def _render_rgb(self, camera) -> jax.Array:
        return self._eval_render()(
            self.state.params,
            self.state.alive,
            self.state.deform_vars,
            camera,
            self.state.step >= self.config.splat.warm_up,
        )

    # ------------------------------------------------------------------
    def _eval_scan_render(self):
        """render(state, camera) -> rgb for the batched eval sweep; the
        ControlTrainer overrides this to route through the control model."""
        cfg = self.config
        deform_apply = self.deform_apply

        def render(state, camera):
            return forward(
                cfg.splat,
                state.params,
                state.alive,
                camera,
                deform_variables=state.deform_vars,
                deform_apply=deform_apply,
                sh_degree_now=cfg.splat.sh_degree,
                warmed_up=state.step >= cfg.splat.warm_up,
                train=False,
            )["rgb"]

        return render

    def _eval_scan_key(self) -> tuple:
        """Identities of every object the _eval_scan_render closure captures
        at build time — the sweep cache key must change when any of them is
        replaced, or a cached sweep keeps stale captures (ADVICE r4).
        Subclasses whose scan-render captures more MUST extend this."""
        return (id(self.config),)

    def _eval_sweep_fn(self, n_frames: int):
        """ONE-dispatch eval sweep: renders every stacked eval frame inside a
        jitted lax.scan and reduces PSNR/SSIM on device. The per-frame python
        loop paid a tunnel round trip per render dispatch PLUS two more per
        metric sync — on the tunneled chip that is ~0.3-1 s per frame of pure
        host latency, and transient host load swung measured rays/s 150x
        between sweeps at UNCHANGED device throughput (docs/QUALITY_R3.md;
        VERDICT r3 item 5). Cache key: _eval_scan_key() + frame count."""
        key = self._eval_scan_key() + (n_frames,)
        if getattr(self, "_eval_sweep_key", None) != key:
            render = self._eval_scan_render()

            @jax.jit
            def sweep(state, cam_b, gts):
                def body(_, i):
                    camera = jax.tree.map(lambda a: a[i], cam_b)
                    rgb = render(state, camera)
                    gt = gts[i]
                    return _, (psnr(rgb, gt), ssim(rgb, gt))

                _, (ps, ss) = jax.lax.scan(
                    body, None, jnp.arange(n_frames, dtype=jnp.int32)
                )
                return ps, ss

            self._eval_sweep_cache = sweep
            self._eval_sweep_key = key
        return self._eval_sweep_cache

    def _eval_arena(self, dm, max_images):
        """Stacked eval-split arena (camera SoA + gt stack), device-resident;
        rebuilt only when the split or cap changes."""
        # key on the dm OBJECT (held strongly by the cache entry) — keying on
        # id(dm) alone could alias a new datamanager that reuses a collected
        # one's id and silently serve the previous split's frames (ADVICE r4)
        key = (dm, max_images)
        cached = getattr(self, "_eval_arena_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        from ..parallel.sharding import stack_cameras

        cams, gts = [], []
        for camera, batch in dm.eval_frames():
            cams.append(camera)
            gts.append(batch["image"][..., :3])
            if max_images and len(cams) >= max_images:
                break
        if not cams or len({(c.height, c.width) for c in cams}) != 1:
            entry = None  # empty or mixed-size split: per-frame fallback
        else:
            entry = (stack_cameras(cams), jnp.stack(gts), len(cams))
        self._eval_arena_cache = (key, entry)
        return entry

    def viewer_render_fn(self):
        """render_fn(camera, atrb_values|None) -> (H, W, 3) float rgb over the
        CURRENT state (live during training — the reference's `vis: viewer`
        viser loop, freegaussian_controller.py:15-39)."""

        def render_fn(camera, atrb_values=None):
            del atrb_values  # stage-1 has no control sliders
            return self._render_rgb(camera)

        return render_fn

    def viewer_num_attributes(self) -> int:
        return 0  # stage-1 has no control sliders

    def start_viewer(self, port: int = 7007, width: int = 480, height: int = 360):
        """Background HTTP viewer over the live model; returns the server."""
        from ..viewer import ViewerServer

        server = ViewerServer(
            self.viewer_render_fn(),
            num_attributes=self.viewer_num_attributes(),
            width=width,
            height=height,
            port=port,
        )
        server.start_background()
        print(f"viewer: http://localhost:{server.port}/")
        return server

    def _log_metrics(self, row: Dict[str, float], step: int, prefix: str = "train") -> None:
        with open(self.metrics_log, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self.tb_writer is not None:
            for k, v in row.items():
                if isinstance(v, (int, float)) and k not in ("step",):
                    self.tb_writer.add_scalar(f"{prefix}/{k}", v, step)

    # ------------------------------------------------------------------
    def _isect_capacity(self) -> int:
        splat = self.config.splat
        if splat.isect_capacity is not None:
            return splat.isect_capacity
        return splat.isect_capacity_factor * self.config.capacity

    def _maybe_grow_isect_capacity(self, metrics) -> None:
        """Grow the static intersection capacity (re-jit) when the measured
        per-frame intersection count approaches the cap — the capacity-padded
        design silently drops the deepest intersections of the largest
        Gaussians on overflow, so the trainer self-tunes instead of failing
        invisibly."""
        if "num_isects" not in metrics:
            return
        cap = self._isect_capacity()
        num = float(metrics["num_isects"])
        if num > cap:
            import warnings

            warnings.warn(
                f"intersection overflow: {int(num)} > capacity {cap}; the "
                "deepest intersections of the largest Gaussians were DROPPED "
                "this step (capacity is being grown)"
            )
        new_cap = None
        low = num > 0 and num < 0.35 * cap
        self._isect_low_streak = self._isect_low_streak + 1 if low else 0
        self._isect_recent = (getattr(self, "_isect_recent", []) + [num])[-10:]
        if num > 0.85 * cap:
            new_cap = 2 * cap
            ceiling = self._isect_capacity_ceiling()
            if new_cap > ceiling:
                new_cap = ceiling if cap < ceiling else None
                import warnings

                warnings.warn(
                    f"intersection capacity clamped at the SMEM-safe "
                    f"ceiling {ceiling} (measured {int(num)}): the pixel "
                    "kernels' scalar-prefetch segment tables must fit SMEM. "
                    "Deepest intersections of the largest Gaussians will be "
                    "dropped while the scene stays this dense."
                )
        elif (
            low
            and self._isect_low_streak >= 10  # ~100 steps of stable low
            and cap > (1 << 14)
            and self.state.step - getattr(self, "_isect_last_rebuild", -(1 << 30))
            >= 1500
        ):
            # SHRINK: with the precull (ops/tiles.py) `num_isects` counts
            # KEPT pairs, typically ~2.7x below the bbox totals the initial
            # alive-count sizing assumes — every capacity-sized cost (sort,
            # gathers, cumsum, reduction) scales with the cap. Headroom 1.35
            # over the recent-window MAX (not the instant reading — the
            # scheduled opacity resets spike isects ~4x for ~100 steps, and a
            # shrink sized to a post-spike trough would regrow immediately).
            # Hysteresis: shrink lands at ~74% occupancy, regrow fires at
            # 85%. Rebuild frequency is bounded by a per-run step COOLDOWN
            # (>=1500 steps since the last rebuild) rather than the old
            # 2-shrink lifetime cap: a full sim schedule resets opacity every
            # 3000 steps, and a run that exhausts its shrinks early then
            # pays ceiling-sized kernels (12x measured) for the rest of
            # training (round-5 640px run, docs/NOTES_ROUND5.md).
            new_cap = max(int(1.35 * max(self._isect_recent)), 1 << 14)
            if new_cap >= cap:
                new_cap = None  # recent max too close to the cap: not worth a re-jit
            self._isect_shrinks += 1
        if new_cap is not None:
            splat = dataclasses.replace(
                self.config.splat, isect_capacity=new_cap
            )
            self.config = dataclasses.replace(self.config, splat=splat)
            self._isect_last_rebuild = int(self.state.step)
            self._rebuild_step_fn()

    def _isect_capacity_ceiling(self) -> int:
        """SMEM-safe intersection-capacity ceiling. The pixel kernels
        scalar-prefetch ~6 i32 segment tables of length
        s_cap = num_tiles + capacity/chunk + 1 into the ~1 MB SMEM; a
        640x640 run that self-tuned to ~3.1M pairs blew it (used 1.27M of
        1.00M, round 5). Budget the tables at ~350 KB and solve for
        capacity."""
        cfg = self.config.splat
        cam = self.datamanager.frames[0].camera
        ts = cfg.tile_size
        tiles = -(-cam.width // ts) * (-(-cam.height // ts))
        s_max = 350_000 // (6 * 4)
        return max((s_max - tiles - 1) * cfg.chunk, 1 << 15)

    def _rebuild_step_fn(self) -> None:
        """(Re)build the jitted train step + the raw body the scan-chunked
        path embeds in lax.scan; rebuilt on config changes (capacity growth).
        ControlTrainer overrides this to rebuild its stage-2 step."""
        kwargs = dict(
            densify_cfg=self.config.densify,
            optimizers=self.optimizers,
            deform_apply=self.deform_apply,
            num_train_data=len(self.datamanager),
        )
        self.step_fn = make_train_step(self.config.splat, **kwargs)
        self.step_fn_raw = make_train_step(self.config.splat, jit=False, **kwargs)
        self._scan_fn_cache = {}

    # ------------------------------------------------------------------
    def _downscale_batch(self, camera: Camera, batch, d: int):
        if d == 1:
            return camera, batch
        from ..ops.math import resize_image

        cam = camera.downscaled(d)
        out = dict(batch)
        out["image"] = resize_image(batch["image"], d)
        if "flow" in out:
            out["flow"] = resize_image(out["flow"], d) / d
        if "depth0" in out:
            out["depth0"] = resize_image(out["depth0"], d)
        if "mask" in out:
            # area-downsample the float mask, then re-binarize: a pixel stays
            # masked-out unless its full-res window was mostly foreground
            # (ref: _downscale_if_required on batch["mask"],
            # freegaussian_model.py:948-957)
            out["mask"] = (resize_image(out["mask"], d) > 0.5).astype(
                out["mask"].dtype
            )
        if "atrb_mask" in out:
            am = out["atrb_mask"]
            out["atrb_mask"] = resize_image(am.astype(jnp.float32), d) > 0.5
        return cam, out

    def _maybe_start_viewer(self) -> None:
        if "viewer" in self.config.vis and self._viewer is None:
            self._viewer = self.start_viewer(port=self.config.viewer_port)

    def _dispatch_step(self, i: int, idx: int, camera: Camera, batch):
        """Run one jitted training step (stage-1: flow-batch prep + step_fn);
        ControlTrainer overrides this with the stage-2 step so both stages
        share the SAME cadence loop (eval/save/steps-per-sec/NaN watchdog/
        capacity self-tuning — ref runs one Trainer for both,
        freegaussian_config.py:31-34)."""
        cfg = self.config
        use_flow = (
            cfg.splat.flow_loss_weight > 0 or cfg.splat.flow_3d_loss_weight > 0
        )
        d = downscale_phase(cfg.splat, i)
        camera, batch = self._downscale_batch(camera, batch, d)
        camera0 = None
        if use_flow:
            # Always pass camera0 + (possibly zero-filled) flow entries so
            # the jitted step keeps ONE signature across frames; per-frame
            # validity gates the losses numerically (train_step.py).
            camera0 = self.datamanager.camera0(idx)
            if d > 1:
                camera0 = camera0.downscaled(d)
            h, w = camera.height, camera.width
            if "flow" not in batch:
                batch["flow"] = jnp.zeros((h, w, 2), jnp.float32)
                batch["flow_valid"] = jnp.asarray(0.0)
            else:
                batch["flow_valid"] = jnp.asarray(1.0)
            if cfg.splat.flow_3d_loss_weight > 0:
                if "depth0" not in batch:
                    batch["depth0"] = jnp.zeros((h, w, 1), jnp.float32)
                    batch["depth0_valid"] = jnp.asarray(0.0)
                else:
                    batch["depth0_valid"] = jnp.asarray(1.0)
        sh_deg = sh_degree_to_use(cfg.splat, i)
        return self.step_fn(
            self.state,
            camera,
            batch,
            sh_deg,
            camera0=camera0,
            cam_idx=jnp.asarray(idx),
        )

    # ------------------------------------------------------------------
    # scan-chunked training (cfg.scan_chunk > 1): identical step math and
    # frame order to the per-step loop, but up to scan_chunk steps run as ONE
    # device-side lax.scan dispatch — the per-call host round trip (~100-300
    # ms through the tunneled TPU backend) otherwise dominates small scenes.
    # ------------------------------------------------------------------
    def _scan_body(self, state, camera, batch, sh_deg: int, camera0, idx):
        """Raw (unjitted) step for embedding in the chunk scan; ControlTrainer
        overrides this with the stage-2 raw step."""
        return self.step_fn_raw(
            state, camera, batch, sh_deg, camera0=camera0, cam_idx=idx
        )

    def _device_dataset(self, d: int):
        """Stack every frame (downscaled by d) into device-resident arenas:
        camera SoA, optional camera0 SoA, and batch arrays with the same
        zero-fill + validity-gate policy as _dispatch_step. Built once per
        downscale phase; the scan indexes into it per step."""
        cache = getattr(self, "_device_ds_cache", None)
        if cache is None:
            cache = self._device_ds_cache = {}
        if d in cache:
            return cache[d]
        from ..parallel.sharding import stack_cameras

        cfg = self.config
        use_flow = (
            cfg.splat.flow_loss_weight > 0 or cfg.splat.flow_3d_loss_weight > 0
        )
        cams, cams0, batches = [], [], []
        any_mask = any(f.mask is not None for f in self.datamanager.frames)
        for idx in range(len(self.datamanager)):
            camera, batch = self.datamanager.get_batch(idx)
            camera, batch = self._downscale_batch(camera, batch, d)
            h, w = camera.height, camera.width
            camera0 = self.datamanager.camera0(idx)
            if d > 1:
                camera0 = camera0.downscaled(d)
            if use_flow:
                if "flow" not in batch:
                    batch["flow"] = jnp.zeros((h, w, 2), jnp.float32)
                    batch["flow_valid"] = jnp.asarray(0.0)
                else:
                    batch["flow_valid"] = jnp.asarray(1.0)
                if cfg.splat.flow_3d_loss_weight > 0:
                    if "depth0" not in batch:
                        batch["depth0"] = jnp.zeros((h, w, 1), jnp.float32)
                        batch["depth0_valid"] = jnp.asarray(0.0)
                    else:
                        batch["depth0_valid"] = jnp.asarray(1.0)
            else:
                batch.pop("flow", None)
                batch.pop("depth0", None)
            if any_mask and "mask" not in batch:
                batch["mask"] = jnp.ones((h, w, 1), jnp.float32)
            # keys the stage-1/stage-2 losses never read stay off the arena
            batch.pop("atrb_mask", None)
            batch.pop("mask_valid", None)
            cams.append(camera)
            cams0.append(camera0)
            batches.append(batch)
        stacked = {
            k: jnp.stack([b[k] for b in batches]) for k in batches[0].keys()
        }
        entry = (
            stack_cameras(cams),
            stack_cameras(cams0) if use_flow else None,
            stacked,
        )
        cache[d] = entry
        return entry

    def _scan_fn(self, d: int, sh_deg: int):
        key = (d, sh_deg)
        cached = self._scan_fn_cache.get(key)
        if cached is not None:
            return cached
        cam_b, cam0_b, data = self._device_dataset(d)
        use0 = cam0_b is not None

        # The dataset arrays are jit ARGUMENTS, not closure captures: a
        # closure capture becomes an inline CONSTANT of the lowered program,
        # and at 640px the image/flow/depth stacks are hundreds of MB —
        # the serialized compile request then exceeds the remote-compile
        # service's body limit (HTTP 413, round-5 640px quality run).
        # Device-resident args are passed by reference at each call.
        def chunk(state, idxs, cam_b, cam0_b, data):
            def body(st, i):
                camera = jax.tree.map(lambda a: a[i], cam_b)
                camera0 = (
                    jax.tree.map(lambda a: a[i], cam0_b) if use0 else None
                )
                batch = {k: v[i] for k, v in data.items()}
                return self._scan_body(st, camera, batch, sh_deg, camera0, i)

            return jax.lax.scan(body, state, idxs)

        jitted = jax.jit(chunk)

        def fn(state, idxs):
            return jitted(state, idxs, cam_b, cam0_b if use0 else None, data)

        self._scan_fn_cache[key] = fn
        return fn

    def _train_scan(self, n: int) -> Dict[str, float]:
        cfg = self.config
        self._maybe_start_viewer()
        start = int(self.state.step)
        end = start + n
        last_metrics: Dict[str, float] = {}
        win_t = time.time()
        win_step = start
        i = start
        while i < end:
            d = downscale_phase(cfg.splat, i)
            sh_deg = sh_degree_to_use(cfg.splat, i)
            stop = min(i + cfg.scan_chunk, end)
            # static-shape phase boundaries: downscale factor and SH degree
            # are compile-time constants of the chunk
            if downscale_phase(cfg.splat, stop - 1) != d:
                sch = cfg.splat.resolution_schedule
                stop = min(stop, ((i // sch) + 1) * sch)
            if sh_degree_to_use(cfg.splat, stop - 1) != sh_deg:
                shi = cfg.splat.sh_degree_interval
                stop = min(stop, ((i // shi) + 1) * shi)
            # cadence points must land on chunk boundaries
            for cad in (
                cfg.steps_per_eval_all_images,
                cfg.steps_per_eval_image,
                cfg.steps_per_save,
            ):
                if cad:
                    stop = min(stop, ((i // cad) + 1) * cad)
            length = stop - i
            idxs = jnp.asarray(self.datamanager.draw_indices(length), jnp.int32)
            self.state, stacked = self._scan_fn(d, sh_deg)(self.state, idxs)
            stacked = {k: np.asarray(v) for k, v in stacked.items()}
            now = time.time()
            sps = (stop - win_step) / max(now - win_t, 1e-9)
            for s in range(i, stop):
                if s % cfg.steps_per_log == 0:
                    row = {k: float(v[s - i]) for k, v in stacked.items()}
                    row["step"] = s
                    row["steps_per_sec"] = sps
                    last_metrics = row
                    self._log_metrics(row, s)
            win_t, win_step = now, stop
            if "num_isects" in stacked:
                # self-tune off the chunk's PEAK (the loop path samples every
                # steps_per_log; overflow inside a chunk is caught one chunk
                # late, the same lag class)
                self._maybe_grow_isect_capacity(
                    {"num_isects": float(np.max(stacked["num_isects"]))}
                )
            poisoned = not np.all(
                np.isfinite(stacked.get("loss", np.zeros(1)))
            ) or not np.all(stacked.get("params_finite", np.ones(1)))
            if cfg.halt_on_nan and poisoned:
                bad = int(
                    np.argmax(~np.isfinite(stacked.get("loss", np.zeros(1))))
                )
                raise FloatingPointError(
                    f"non-finite loss or params inside scan chunk [{i}, {stop})"
                    f" (first bad loss at step ~{i + bad}); training halted — "
                    "see TrainerConfig.halt_on_nan"
                )
            i = stop
            if (
                cfg.steps_per_eval_all_images
                and i % cfg.steps_per_eval_all_images == 0
            ):
                ev = self.eval_all(
                    max_images=cfg.eval_all_max_images,
                    dump_dir=(
                        Path(cfg.eval_dump_dir) / f"step_{i:09d}"
                        if cfg.eval_dump_dir
                        else None
                    ),
                )
                ev["step"] = i
                ev["eval"] = "all"
                self._log_metrics(ev, i, "eval")
                win_t = time.time()
                win_step = i
            elif cfg.steps_per_eval_image and i % cfg.steps_per_eval_image == 0:
                ev = self.eval_one(i)
                if ev is not None:
                    self._log_metrics(ev, i, "eval_image")
                win_t = time.time()
                win_step = i
            if cfg.steps_per_save and i % cfg.steps_per_save == 0:
                self.save(i)
        return last_metrics

    def train(self, num_steps: Optional[int] = None) -> Dict[str, float]:
        cfg = self.config
        self._maybe_start_viewer()
        n = num_steps if num_steps is not None else cfg.max_num_iterations
        if cfg.scan_chunk > 1:
            return self._train_scan(n)
        last_metrics: Dict[str, float] = {}
        start = int(self.state.step)
        # plain window timer for steps/s (measures only this call's steps)
        win_t = time.time()
        win_step = start
        for i in range(start, start + n):
            idx, camera, batch = self.datamanager.next_train_indexed(i)
            self.state, metrics = self._dispatch_step(i, idx, camera, batch)
            if i % cfg.steps_per_log == 0:
                self._maybe_grow_isect_capacity(metrics)
                last_metrics = {k: float(v) for k, v in metrics.items()}
                last_metrics["step"] = i
                poisoned = not np.isfinite(
                    last_metrics.get("loss", 0.0)
                ) or not last_metrics.get("params_finite", 1.0)
                if cfg.halt_on_nan and poisoned:
                    self._log_metrics(last_metrics, i)
                    raise FloatingPointError(
                        f"non-finite loss or params at step {i} "
                        f"(metrics: {last_metrics}); training halted — a "
                        "poisoned state cannot recover (NaN params render as "
                        "background with a finite loss). Resume from the "
                        "last checkpoint; set halt_on_nan=False to continue "
                        "anyway."
                    )
                now = time.time()
                last_metrics["steps_per_sec"] = (i + 1 - win_step) / max(
                    now - win_t, 1e-9
                )
                win_t, win_step = now, i + 1
                self._log_metrics(last_metrics, i)
            if (
                cfg.steps_per_eval_all_images
                and (i + 1) % cfg.steps_per_eval_all_images == 0
            ):
                ev = self.eval_all(
                    max_images=cfg.eval_all_max_images,
                    dump_dir=(
                        Path(cfg.eval_dump_dir) / f"step_{i + 1:09d}"
                        if cfg.eval_dump_dir
                        else None
                    ),
                )
                ev["step"] = i + 1
                ev["eval"] = "all"
                self._log_metrics(ev, i + 1, "eval")
                win_t = time.time()  # don't bill eval time to steps/s
                win_step = i + 1
            elif (
                cfg.steps_per_eval_image and (i + 1) % cfg.steps_per_eval_image == 0
            ):
                ev = self.eval_one(i + 1)
                if ev is not None:
                    self._log_metrics(ev, i + 1, "eval_image")
                win_t = time.time()
                win_step = i + 1
            if cfg.steps_per_save and (i + 1) % cfg.steps_per_save == 0:
                self.save(i + 1)
        return last_metrics

    # ------------------------------------------------------------------
    def eval_one(self, step: int) -> Optional[Dict[str, float]]:
        """Single-image eval (the reference's steps_per_eval_image cadence,
        freegaussian_config.py:31)."""
        dm = self.eval_datamanager or self.datamanager
        if len(dm) == 0:
            return None
        idx = step % len(dm)
        camera, batch = dm.get_batch(idx)
        rgb = self._render_rgb(camera)
        gt = batch["image"][..., :3]
        p, s = _quality_metrics(rgb, gt)
        return {
            "step": step,
            "eval": "image",
            "eval_idx": idx,
            "psnr": float(p),
            "ssim": float(s),
        }

    # ------------------------------------------------------------------
    def eval_all(
        self,
        max_images: Optional[int] = None,
        dump_dir: Optional[Path] = None,
    ) -> Dict[str, float]:
        """PSNR/SSIM + rays-per-sec over the eval split (ref eval loop,
        freegaussian_pipeline.py:103-172). `dump_dir` writes gt|pred side-by-
        side PNGs per image (ref :144-147)."""
        dm = self.eval_datamanager or self.datamanager
        psnrs, ssims, lpipss = [], [], []
        from ..models.metrics import lpips as lpips_fn
        from ..models.metrics import lpips_available

        # Fast path: LPIPS off and no image dump -> whole sweep as ONE
        # device dispatch (see _eval_sweep_fn). LPIPS/dumps need the frames
        # on host anyway, so those sweeps keep the per-frame loop.
        if dump_dir is None and not lpips_available():
            arena = self._eval_arena(dm, max_images)
            if arena is not None:
                cam_b, gts, n = arena
                t0 = time.time()
                ps, ss = self._eval_sweep_fn(n)(self.state, cam_b, gts)
                ps = jax.block_until_ready(ps)
                wall = time.time() - t0
                n_pix = int(gts.shape[0] * gts.shape[1] * gts.shape[2])
                return {
                    "psnr": float(jnp.mean(ps)),
                    "ssim": float(jnp.mean(ss)),
                    "num_rays_per_sec": n_pix / wall,
                    "fps": n / wall,
                    "gaussian_count": int(jnp.sum(self.state.alive)),
                    "lpips": float("nan"),
                    "lpips_available": False,
                }
        if dump_dir is not None:
            Path(dump_dir).mkdir(parents=True, exist_ok=True)
        t0 = time.time()
        n_pix = 0
        count = 0
        for camera, batch in dm.eval_frames():
            rgb = self._render_rgb(camera)
            gt = batch["image"][..., :3]
            p, s = _quality_metrics(rgb, gt)
            psnrs.append(float(p))
            ssims.append(float(s))
            lp = lpips_fn(np.asarray(rgb), np.asarray(gt))
            if lp is not None:
                lpipss.append(lp)
            if dump_dir is not None:
                import imageio.v2 as imageio

                pair = np.concatenate(
                    [np.asarray(gt), np.asarray(rgb)], axis=1
                )
                imageio.imwrite(
                    Path(dump_dir) / f"eval_{count:04d}.png",
                    (np.clip(pair, 0, 1) * 255).astype(np.uint8),
                )
            n_pix += camera.width * camera.height
            count += 1
            if max_images and count >= max_images:
                break
        wall = time.time() - t0
        result = {
            "psnr": float(np.mean(psnrs)),
            "ssim": float(np.mean(ssims)),
            "num_rays_per_sec": n_pix / wall,
            "fps": count / wall,
            "gaussian_count": int(jnp.sum(self.state.alive)),
            # explicit, never silently omitted: LPIPS is a headline reference
            # metric (freegaussian_model.py:1005-1051). Out-of-band sentinel
            # (ADVICE r3): the numeric key is NaN when no pretrained weights
            # exist in this environment, and `lpips_available` says which —
            # a string here would break any numeric consumer of the dict.
            "lpips": float(np.mean(lpipss)) if lpipss else float("nan"),
            "lpips_available": bool(lpipss),
        }
        return result

    # ------------------------------------------------------------------
    def save(self, step: int) -> Path:
        path = self.out_dir / "checkpoints"
        save_checkpoint(path, step, self.state)
        return path

    def load(self, path: Path, step: Optional[int] = None) -> None:
        self.state = load_checkpoint(Path(path), self.state, step)
