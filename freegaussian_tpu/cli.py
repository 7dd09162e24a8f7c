"""CLI: train / eval / render / interflow / cluster verbs.

Replaces the `ns-train freegaussian ...` / `ns-eval` / `ns-render` surface
(reference L0, README.md:44-58) with a self-contained argparse shell:

    python -m freegaussian_tpu.cli train --data <dir> --dataparser synthetic
    python -m freegaussian_tpu.cli train --config configs/sim/base.yaml \
        --scene-config configs/sim/scene.yaml
    python -m freegaussian_tpu.cli eval --data <dir> --load <ckpt-dir>
    python -m freegaussian_tpu.cli render --data <dir> --load <ckpt-dir> --out renders/
    python -m freegaussian_tpu.cli interflow --data <dir> --interval 2
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from pathlib import Path


def _build_trainer(args):
    from .engine.config import trainer_config_from_yaml
    from .engine.trainer import Trainer, TrainerConfig

    if args.config:
        cfg = trainer_config_from_yaml(args.config, args.scene_config)
    else:
        cfg = TrainerConfig()
    if args.data:
        cfg = dataclasses.replace(cfg, data=args.data)
    if args.dataparser:
        cfg = dataclasses.replace(cfg, dataparser=args.dataparser)
    if args.max_iterations:
        cfg = dataclasses.replace(cfg, max_num_iterations=args.max_iterations)
    if args.capacity:
        cfg = dataclasses.replace(cfg, capacity=args.capacity)
    trainer = Trainer(cfg)
    if args.load:
        trainer.load(Path(args.load))
    return trainer


def main(argv=None):
    p = argparse.ArgumentParser(prog="freegaussian-tpu")
    p.add_argument(
        "--device",
        choices=["auto", "cpu", "tpu"],
        default="auto",
        help="jax platform override; 'cpu' frees the (single-session) TPU "
        "chip for CPU-side work — the axon sitecustomize ignores the "
        "JAX_PLATFORMS env var, so this must be set before first jax use",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--data", default="")
        sp.add_argument("--dataparser", default="")
        sp.add_argument("--config", default="")
        sp.add_argument("--scene-config", default="")
        sp.add_argument("--load", default="")
        sp.add_argument("--max-iterations", type=int, default=0)
        sp.add_argument("--capacity", type=int, default=0)

    sp = sub.add_parser("train", help="stage-1 training")
    common(sp)
    sp = sub.add_parser("eval", help="evaluate PSNR/SSIM over the eval split")
    common(sp)
    sp.add_argument("--dump-images", default="", help="write gt|pred PNGs here")
    sp.add_argument("--report", default="", help="also write the JSON report to this path")
    sp.add_argument("--stage1-checkpoint", default="",
                    help="evaluate the stage-2 CONTROL model (with --gaussian-mask)")
    sp.add_argument("--gaussian-mask", default="")
    sp = sub.add_parser("render", help="render RGB + depth over cameras")
    common(sp)
    sp.add_argument("--out", default="renders")
    sp.add_argument("--path", choices=["dataset", "orbit"], default="dataset",
                    help="dataset cameras or a generated orbit camera path")
    sp.add_argument("--num-frames", type=int, default=60)
    sp.add_argument("--orbit-radius", type=float, default=0.0,
                    help="0 = use the mean camera distance")
    sp = sub.add_parser("interflow", help="generate epipolar interflow npys")
    sp.add_argument("--data", required=True)
    sp.add_argument("--interval", type=int, default=2)
    sp.add_argument("--form", choices=["velocity", "backproject"], default="velocity")
    sp.add_argument("--dataparser", choices=["synthetic", "real"], default="synthetic")
    sp.add_argument(
        "--flow-dir", default=None,
        help="directory of precomputed optical-flow .npy maps (H, W, 2), "
        "one per frame stem — the hand-off seam for an external flow net "
        "(the reference runs mmflow RAFT there, preprocess/optical_flow.py"
        ":1-31; any flow estimator works). Default 'opticalflow/'; missing "
        "files fall back to zero flow (static-camera captures), matching "
        "the reference's own fallback (epipolar_flow.py:369-372).",
    )

    sp = sub.add_parser("train-control", help="stage-2 control training")
    common(sp)
    sp.add_argument("--stage1-checkpoint", required=True)
    sp.add_argument("--gaussian-mask", default="")

    sp = sub.add_parser("export", help="export a checkpoint (INRIA ply / reference torch ckpt)")
    common(sp)
    sp.add_argument("--out", required=True)
    sp.add_argument("--format", choices=["ply", "torch"], default="ply")

    sp = sub.add_parser("viewer", help="serve the interactive orbit/slider viewer")
    common(sp)
    sp.add_argument("--stage1-checkpoint", default="",
                    help="serve the stage-2 CONTROL model (with --gaussian-mask)")
    sp.add_argument("--gaussian-mask", default="")
    sp.add_argument("--port", type=int, default=7007)
    sp.add_argument("--width", type=int, default=480)
    sp.add_argument("--height", type=int, default=360)

    sp = sub.add_parser("cluster", help="vote articulation masks onto Gaussians")
    common(sp)
    sp.add_argument("--key-frames", default="", help="key_frames.yaml path")
    sp.add_argument("--scene", default="", help="scene name in key_frames.yaml")
    sp.add_argument("--dynamic", action="store_true", help="deform to frame times")
    sp.add_argument("--out", default="")
    sp.add_argument(
        "--exclusive", action="store_true",
        help="vote-count argmax assignment (one attribute per Gaussian) "
        "instead of the reference's boolean OR — removes the shared-row "
        "control cross-talk channel (docs/QUALITY_R5_3PART.md)",
    )
    sp.add_argument(
        "--depth-window", type=float, nargs=2, default=(-0.1, 1.0),
        metavar=("LOW", "HIGH"),
        help="depth-consistency window as fractions of the Gaussian depth "
        "(default = the reference's -0.1 1.0, knn_gaussian.py:116-124; "
        "tighter windows exclude occluded Gaussians from the vote)",
    )

    args = p.parse_args(argv)

    from .utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    if args.device != "auto":
        import jax

        jax.config.update("jax_platforms", args.device)

    if args.cmd == "train":
        trainer = _build_trainer(args)
        metrics = trainer.train()
        trainer.save(int(trainer.state.step))
        print(json.dumps(metrics))
    elif args.cmd == "eval":
        if args.stage1_checkpoint:
            from .engine.config import trainer_config_from_yaml
            from .engine.control_trainer import ControlTrainer
            from .engine.trainer import TrainerConfig

            cfg = (
                trainer_config_from_yaml(args.config, args.scene_config)
                if args.config
                else TrainerConfig()
            )
            if args.data:
                cfg = dataclasses.replace(cfg, data=args.data)
            trainer = ControlTrainer(
                cfg,
                load_deformable_checkpoint=Path(args.stage1_checkpoint),
                gaussian_mask_path=Path(args.gaussian_mask) if args.gaussian_mask else None,
            )
            if args.load:
                trainer.load(Path(args.load))
        else:
            trainer = _build_trainer(args)
        result = trainer.eval_all(
            dump_dir=Path(args.dump_images) if args.dump_images else None
        )
        if args.report:
            Path(args.report).parent.mkdir(parents=True, exist_ok=True)
            Path(args.report).write_text(json.dumps(result, indent=2))
        print(json.dumps(result))
    elif args.cmd == "render":
        trainer = _build_trainer(args)
        from .preprocess.render_offline import render_color_images, render_depth_maps

        if args.path == "orbit":
            from .data.cameras import orbit_camera_path

            cams = orbit_camera_path(
                [f.camera for f in trainer.datamanager.frames],
                num_frames=args.num_frames,
                radius=args.orbit_radius or None,
            )
        else:
            cams = [f.camera for f in trainer.datamanager.frames]
        out = Path(args.out)
        render_color_images(
            trainer.config.splat, trainer.state.params, trainer.state.alive,
            cams, out / "rgb",
            deform_apply=trainer.deform.apply, deform_vars=trainer.state.deform_vars,
        )
        render_depth_maps(
            trainer.config.splat, trainer.state.params, trainer.state.alive,
            cams, out / "depth",
            dataparser_scale=trainer.parsed.dataparser_scale,
            deform_apply=trainer.deform.apply, deform_vars=trainer.state.deform_vars,
        )
        print(f"rendered {len(cams)} views to {out}")
    elif args.cmd == "interflow":
        from .preprocess.epipolar_flow import generate_interflow_dataset

        n = generate_interflow_dataset(
            Path(args.data), interval=args.interval, form=args.form,
            dataparser=args.dataparser, flow_dir=args.flow_dir,
        )
        print(f"wrote {n} interflow maps")
    elif args.cmd == "export":
        trainer = _build_trainer(args)
        out = Path(args.out)
        if args.format == "ply":
            from .data.splat_export import export_splat_ply

            n = export_splat_ply(out, trainer.state.params, trainer.state.alive)
            print(f"wrote {n} gaussians to {out}")
        else:
            from .models.torch_compat import export_reference_checkpoint

            export_reference_checkpoint(
                out, trainer.state.params, trainer.state.alive,
                deform_vars=trainer.state.deform_vars,
                control_vars=trainer.state.control_vars,
                step=int(trainer.state.step),
                is_blender=trainer.config.splat.is_blender,
            )
            print(f"wrote reference checkpoint to {out}")
    elif args.cmd == "train-control":
        import dataclasses as dc

        from .engine.config import trainer_config_from_yaml
        from .engine.control_trainer import ControlTrainer
        from .engine.trainer import TrainerConfig

        if args.config:
            cfg = trainer_config_from_yaml(args.config, args.scene_config)
        else:
            cfg = TrainerConfig()
        if args.data:
            cfg = dc.replace(cfg, data=args.data)
        if args.dataparser:
            cfg = dc.replace(cfg, dataparser=args.dataparser)
        trainer = ControlTrainer(
            cfg,
            load_deformable_checkpoint=Path(args.stage1_checkpoint),
            gaussian_mask_path=Path(args.gaussian_mask) if args.gaussian_mask else None,
        )
        metrics = trainer.train()
        trainer.save(int(trainer.state.step))
        print(json.dumps(metrics))
    elif args.cmd == "viewer":
        if args.stage1_checkpoint:
            from .engine.config import trainer_config_from_yaml
            from .engine.control_trainer import ControlTrainer
            from .engine.trainer import TrainerConfig

            cfg = (
                trainer_config_from_yaml(args.config, args.scene_config)
                if args.config
                else TrainerConfig()
            )
            if args.data:
                cfg = dataclasses.replace(cfg, data=args.data)
            trainer = ControlTrainer(
                cfg,
                load_deformable_checkpoint=Path(args.stage1_checkpoint),
                gaussian_mask_path=Path(args.gaussian_mask) if args.gaussian_mask else None,
            )
            if args.load:
                trainer.load(Path(args.load))
        else:
            trainer = _build_trainer(args)
        server = trainer.start_viewer(
            port=args.port, width=args.width, height=args.height
        )
        print("serving; ctrl-c to stop")
        try:
            import time as _time

            while True:
                _time.sleep(3600)
        except KeyboardInterrupt:
            server.shutdown()
    elif args.cmd == "cluster":
        import numpy as np

        from .preprocess.clustering import cluster_gaussians, save_gaussian_mask
        from .preprocess.cluster_viz import export_cluster_ply
        from .preprocess.key_frames import load_key_frames

        trainer = _build_trainer(args)
        if args.key_frames and args.scene:
            frame_ids = load_key_frames(Path(args.key_frames), args.scene)
        else:
            frame_ids = list(range(len(trainer.datamanager)))
        key_frames = {}
        cameras = {}
        valids = {}
        parsed_valids = getattr(trainer.parsed, "mask_valids", None)
        for i in frame_ids:
            f = trainer.datamanager.frames[i]
            if f.atrb_mask is None:
                continue
            key_frames[i] = f.atrb_mask
            cameras[i] = f.camera
            if parsed_valids is not None:
                valids[i] = parsed_valids[i]
        mask = cluster_gaussians(
            trainer.state.params,
            trainer.state.alive,
            key_frames,
            cameras,
            deform_apply=trainer.deform.apply if args.dynamic else None,
            deform_vars=trainer.state.deform_vars if args.dynamic else None,
            dynamic=args.dynamic,
            mask_valids=valids or None,
            exclusive=args.exclusive,
            depth_low=args.depth_window[0],
            depth_high=args.depth_window[1],
        )
        m = mask.shape[1]
        n_live = int(np.asarray(trainer.state.alive).sum())
        out = Path(args.out) if args.out else Path(args.data) / f"gaussian_mask_{n_live}x{m}.npy"
        save_gaussian_mask(out, mask, trainer.state.alive)
        export_cluster_ply(
            out.with_suffix(".ply"),
            np.asarray(trainer.state.params["means"]),
            np.asarray(mask),
            np.asarray(trainer.state.alive),
        )
        print(f"wrote {out} and cluster PLY")


if __name__ == "__main__":
    main()
