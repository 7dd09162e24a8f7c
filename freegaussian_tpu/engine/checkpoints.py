"""Orbax checkpointing with Gaussian-count metadata.

Replaces nerfstudio's torch `step-%09d.ckpt` {pipeline, step, optimizers}
files (SURVEY §5): padded-capacity arrays make the reference's N-resize at
load time (freegaussian_model.py:278-291) a re-pad, and stage-2's cross-load
of a stage-1 checkpoint (freegaussian_control_model.py:34-50) is a plain
state restore with `strict=False` semantics (missing keys keep their init)."""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(directory: Path, step: int, state: Any) -> None:
    directory = Path(directory).absolute()
    directory.mkdir(parents=True, exist_ok=True)
    # Re-saving a step overwrites (nerfstudio semantics); this orbax version's
    # CheckpointManager refuses existing steps even with force, so remove the
    # stale step directory first.
    import shutil

    stale = directory / str(step)
    if stale.exists():
        shutil.rmtree(stale)
    with ocp.CheckpointManager(directory) as mgr:
        mgr.save(
            step,
            args=ocp.args.StandardSave(jax.tree.map(np.asarray, state)),
            force=True,
        )
        mgr.wait_until_finished()


def _legacy_rest_template(template: Any):
    """Adapter for pre-flat checkpoints: `features_rest` (and its Adam
    moments) used to be stored (N, K-1, 3); it is now flat (N, (K-1)*3)
    (models/gaussians.py). Returns (template with those leaves reshaped
    3D, fixup) — fixup flattens them back after restore."""
    paths = []

    def widen(path, leaf):
        if any("features_rest" in str(p) for p in path) and getattr(
            leaf, "ndim", 0
        ) == 2 and leaf.shape[-1] % 3 == 0:
            paths.append(path)
            return np.asarray(leaf).reshape(leaf.shape[0], -1, 3)
        return leaf

    wide = jax.tree_util.tree_map_with_path(widen, template)

    def fixup(restored):
        def flatten(path, leaf):
            if path in paths:
                return np.asarray(leaf).reshape(leaf.shape[0], -1)
            return leaf

        return jax.tree_util.tree_map_with_path(flatten, restored)

    return wide, (fixup if paths else None)


def load_checkpoint(directory: Path, template: Any, step: Optional[int] = None) -> Any:
    directory = Path(directory).absolute()
    with ocp.CheckpointManager(directory) as mgr:
        if step is None:
            step = mgr.latest_step()
        np_template = jax.tree.map(np.asarray, template)
        try:
            restored = mgr.restore(
                step, args=ocp.args.StandardRestore(np_template)
            )
        except Exception:
            wide, fixup = _legacy_rest_template(np_template)
            if fixup is None:
                raise
            restored = fixup(
                mgr.restore(step, args=ocp.args.StandardRestore(wide))
            )
    return jax.tree.map(jax.numpy.asarray, restored)


def cross_load_stage1(
    directory: Path,
    stage2_state: Any,
    *,
    step: Optional[int] = None,
) -> Any:
    """Load a stage-1 checkpoint into a stage-2 TrainState: Gaussians, alive
    mask, and deform variables are taken from stage 1; control variables and
    optimizer states keep their fresh initialization (strict=False)."""
    loaded = load_checkpoint(directory, stage2_state, step)
    return stage2_state.replace(
        params=loaded.params,
        alive=loaded.alive,
        deform_vars=loaded.deform_vars,
    )
