"""Stage-2 trainer: freegaussian-control.

Orchestrates the pipeline the reference's (missing-from-snapshot)
`freegaussian_control_method` registration implies (SURVEY §2.1 quirk): load
the stage-1 checkpoint, load `gaussian_mask_NxM.npy`, set the init camera to
the first train camera (freegaussian_pipeline.py:41-50), and train the
control MLP + Gaussian groups (no deform group, no densification)."""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.control_model import control_forward
from ..models.splat_model import psnr as psnr_fn
from ..preprocess.clustering import load_gaussian_mask
from .checkpoints import cross_load_stage1, load_checkpoint, save_checkpoint
from .control_train_step import make_control_train_step
from .trainer import Trainer, TrainerConfig


class ControlTrainer(Trainer):
    def __init__(
        self,
        config: TrainerConfig,
        *,
        load_deformable_checkpoint: Optional[Path] = None,
        gaussian_mask_path: Optional[Path] = None,
    ):
        super().__init__(config)
        if load_deformable_checkpoint:
            self.state = cross_load_stage1(Path(load_deformable_checkpoint), self.state)

        mask_path = gaussian_mask_path
        if mask_path is None and config.data:
            candidates = sorted(Path(config.data).glob("gaussian_mask_*.npy"))
            if candidates:
                mask_path = candidates[0]
        if mask_path is None:
            raise FileNotFoundError(
                "stage-2 needs a gaussian_mask_NxM.npy (run the clustering "
                "preprocess first; ref: freegaussian_pipeline.py:45-47)"
            )
        self.gaussian_mask = load_gaussian_mask(
            Path(mask_path), config.capacity, self.state.alive
        )
        # init camera := first train camera (freegaussian_pipeline.py:41-42)
        self.init_time = self.datamanager.frames[0].camera.time

        self._rebuild_step_fn()

    def _rebuild_step_fn(self) -> None:
        """Stage-2 step (also rebuilt by the base class's isect-capacity
        self-tuning, which stage-2 now shares — VERDICT r2 #7)."""
        if not hasattr(self, "gaussian_mask"):
            # called from Trainer.__init__ before stage-2 state exists; the
            # real build happens at the end of our own __init__
            super()._rebuild_step_fn()
            return
        args = (
            self.config.splat,
            self.optimizers,
            self.control_apply,
            self.deform_apply,
            self.gaussian_mask,
            self.init_time,
        )
        self.control_step_fn = make_control_train_step(*args)
        self.control_step_raw = make_control_train_step(*args, jit=False)
        self._scan_fn_cache = {}

    def _scan_body(self, state, camera, batch, sh_deg: int, camera0, idx):
        del camera0, idx  # stage-2 has no flow supervision / per-camera state
        return self.control_step_raw(state, camera, batch, sh_deg)

    def _dispatch_step(self, i, idx, camera, batch):
        """One stage-2 step under the SHARED Trainer.train cadence loop
        (eval/save/steps-per-sec/NaN-watchdog/capacity-tuning run exactly as
        in stage 1; the reference uses one Trainer for both stages,
        freegaussian_config.py:31-34)."""
        from ..models.splat_model import sh_degree_to_use
        from .trainer import downscale_phase

        cfg = self.config
        d = downscale_phase(cfg.splat, i)
        camera, batch = self._downscale_batch(camera, batch, d)
        sh_deg = sh_degree_to_use(cfg.splat, i)
        return self.control_step_fn(self.state, camera, batch, sh_deg)

    def _render_rgb(self, camera) -> jax.Array:
        """Stage-2 single-image render (train-mode control state) — makes the
        inherited eval_one cadence render through the CONTROL model."""
        return self._control_eval_render()(
            self.state.params,
            self.state.alive,
            camera,
            self.state.control_vars,
            self.state.deform_vars,
        )

    def _eval_scan_key(self) -> tuple:
        """Stage-2 scan-render additionally captures the clustering mask and
        the init time — include their identities/value so a recomputed mask
        or a new first frame invalidates the cached jitted sweep (ADVICE r4)."""
        return (
            id(self.config),
            id(self.gaussian_mask),
            float(self.init_time),
        )

    def _eval_scan_render(self):
        """Batched-eval hook (Trainer._eval_sweep_fn): stage-2 sweeps must
        render through the CONTROL model, like _render_rgb."""
        cfg = self.config
        control_apply = self.control_apply
        deform_apply = self.deform_apply
        gaussian_mask = self.gaussian_mask
        init_time = self.init_time

        def render(state, camera):
            return control_forward(
                cfg.splat,
                state.params,
                state.alive,
                gaussian_mask,
                camera,
                control_apply,
                state.control_vars,
                deform_apply=deform_apply,
                deform_vars=state.deform_vars,
                init_time=init_time,
                sh_degree_now=cfg.splat.sh_degree,
                train=False,
            )["rgb"]

        return render

    def _control_eval_render(self):
        """Cached jitted stage-2 inference render (train-mode control state);
        see Trainer._eval_render for why eval must not dispatch eagerly."""
        cfg = self.config
        key = self._eval_scan_key()  # same captures as the sweep closure
        if getattr(self, "_ctrl_eval_key", None) != key:
            import jax

            control_apply = self.control_apply
            deform_apply = self.deform_apply
            gaussian_mask = self.gaussian_mask
            init_time = self.init_time

            @jax.jit
            def render(params, alive, camera, control_vars, deform_vars):
                return control_forward(
                    cfg.splat,
                    params,
                    alive,
                    gaussian_mask,
                    camera,
                    control_apply,
                    control_vars,
                    deform_apply=deform_apply,
                    deform_vars=deform_vars,
                    init_time=init_time,
                    sh_degree_now=cfg.splat.sh_degree,
                    train=False,
                )["rgb"]

            self._ctrl_eval_cache = render
            self._ctrl_eval_key = key
        return self._ctrl_eval_cache

    # eval_all / eval_one are inherited: they render via the overridden
    # _render_rgb, i.e. through the CONTROL model with the train-mode control
    # state (deform displacement between init and frame time) — the stage-1
    # eval path would ignore the control field entirely (ref: control model
    # get_outputs train branch, freegaussian_control_model.py:128-140).

    def viewer_num_attributes(self) -> int:
        # gaussian_mask is (N, M): attribute channels only (the clustering
        # drops the background channel, matching knn_gaussian.py:128)
        m = int(self.gaussian_mask.shape[1])
        if m == 0:
            raise ValueError(
                "gaussian_mask has no attribute columns — re-run clustering "
                "(an (N, 0) mask usually means every key frame was skipped)"
            )
        return m

    def viewer_render_fn(self):
        """Stage-2 viewer: attribute sliders drive the control field
        (Controller x0.1 scaling is applied browser-side by the slider
        range; raw 3-vectors arrive here)."""
        import numpy as np

        num_attributes = self.viewer_num_attributes()

        def render_fn(camera, atrb_values=None):
            if atrb_values is None:
                atrb_values = np.zeros((num_attributes, 3), np.float32)
            return self.render_with_control(
                camera, np.asarray(atrb_values, np.float32).reshape(-1, 3)
            )["rgb"]

        return render_fn

    def render_with_control(self, camera, atrb_values) -> Dict[str, jax.Array]:
        """Inference: drive the articulated object with injected attribute
         3-vectors (the GUI slider path). Jitted (re-traces per resolution)."""
        cfg = self.config
        key = self._eval_scan_key()  # includes the captured gaussian_mask
        if getattr(self, "_ctrl_slider_key", None) != key:
            control_apply = self.control_apply
            gaussian_mask = self.gaussian_mask

            @jax.jit
            def render(params, alive, camera, control_vars, atrb):
                return control_forward(
                    cfg.splat,
                    params,
                    alive,
                    gaussian_mask,
                    camera,
                    control_apply,
                    control_vars,
                    atrb_values=atrb,
                    sh_degree_now=cfg.splat.sh_degree,
                    train=False,
                )

            self._ctrl_slider_cache = render
            self._ctrl_slider_key = key
        return self._ctrl_slider_cache(
            self.state.params,
            self.state.alive,
            camera,
            self.state.control_vars,
            jnp.asarray(atrb_values),
        )
