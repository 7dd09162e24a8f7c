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


def _flatten_legacy_rest(restored: Any, template: Any) -> Any:
    """Adapter for pre-flat checkpoints: `features_rest` (and its Adam
    moments) used to be stored (N, K-1, 3); it is now flat (N, (K-1)*3)
    (models/gaussians.py). Orbax restores with the CHECKPOINT's shapes, so
    any leaf that came back one dim wider than its template is reshaped."""

    def fix(t_leaf, r_leaf):
        t_nd = getattr(t_leaf, "ndim", 0)
        if (
            getattr(r_leaf, "ndim", 0) == t_nd + 1
            and t_nd == 2
            and r_leaf.shape[:1] == t_leaf.shape[:1]
            and r_leaf.shape[1] * r_leaf.shape[2] == t_leaf.shape[1]
        ):
            return np.asarray(r_leaf).reshape(t_leaf.shape)
        return r_leaf

    return jax.tree.map(fix, template, restored)


def load_checkpoint(directory: Path, template: Any, step: Optional[int] = None) -> Any:
    directory = Path(directory).absolute()
    with ocp.CheckpointManager(directory) as mgr:
        if step is None:
            step = mgr.latest_step()
        np_template = jax.tree.map(np.asarray, template)
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(np_template)
        )
        restored = _flatten_legacy_rest(restored, np_template)
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
