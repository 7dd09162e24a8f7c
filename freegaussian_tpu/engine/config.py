"""Config system: dataclass configs + YAML overlay with `${eval:...}`
arithmetic resolver and base+scene merge.

Mirrors the reference's three cooperating layers (SURVEY §5): dataclass
configs (nerfstudio InstantiateConfig pattern), CLI flags generated from
them, and the OmegaConf overlay tool scripts/parse_config.py:1-59 — including
its `spatial_lr_scale` meta-parameter (multiplies means/deform/control LRs)
and the `dataparser:` subtree special case. Implemented on plain PyYAML
(omegaconf is not available in this environment)."""

from __future__ import annotations

import dataclasses
import re
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

from ..models.densify import DensifyConfig
from ..models.splat_model import SplatConfig
from .optimizers import OptimizersConfig
from .trainer import TrainerConfig

_EVAL_RE = re.compile(r"^\$\{eval:(.*)\}$")


def _resolve(value: Any) -> Any:
    """Resolve `${eval:expr}` strings (arithmetic only, mirroring the
    reference's OmegaConf eval resolver)."""
    if isinstance(value, str):
        m = _EVAL_RE.match(value.strip())
        if m:
            expr = m.group(1)
            if not re.fullmatch(r"[-+*/(). \d eE]*", expr):
                raise ValueError(f"unsafe eval expression: {expr}")
            return eval(expr, {"__builtins__": {}}, {})
    return value


def deep_merge(base: Dict, overlay: Dict) -> Dict:
    out = dict(base)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def resolve_tree(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: resolve_tree(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [resolve_tree(v) for v in tree]
    return _resolve(tree)


def load_yaml_overlay(base_path: Path, scene_path: Optional[Path] = None) -> Dict:
    """base.yaml + scene.yaml merge with eval resolution
    (ref: scripts/parse_config.py:parse_yaml)."""
    base = yaml.safe_load(Path(base_path).read_text()) or {}
    if scene_path and Path(scene_path).is_file():
        scene = yaml.safe_load(Path(scene_path).read_text()) or {}
        base = deep_merge(base, scene)
    return resolve_tree(base)


def _apply_fields(dc, values: Dict):
    """Apply a flat/nested dict onto a (frozen or mutable) dataclass."""
    updates = {}
    for f in dataclasses.fields(dc):
        if f.name not in values:
            continue
        v = values[f.name]
        cur = getattr(dc, f.name)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            updates[f.name] = _apply_fields(cur, v)
        else:
            updates[f.name] = v
    return dataclasses.replace(dc, **updates)


def trainer_config_from_yaml(
    base_path: Path, scene_path: Optional[Path] = None, **overrides
) -> TrainerConfig:
    """Build a TrainerConfig from the YAML overlay.

    Recognized top-level keys mirror the reference configs
    (config/*/base.yaml): max_num_iterations, steps_per_save, vis (ignored),
    spatial_lr_scale (folded into the optimizer config like
    parse_config.py:41-57), pipeline.model.* -> SplatConfig/DensifyConfig
    fields, dataparser -> dataparser kwargs."""
    tree = load_yaml_overlay(base_path, scene_path)
    tree = deep_merge(tree, overrides)

    cfg = TrainerConfig()
    # top-level trainer fields
    cfg = _apply_fields(cfg, tree)

    spatial = float(tree.get("spatial_lr_scale", 1.0))
    opt = _apply_fields(cfg.optimizers, tree.get("optimizers", {}))
    opt = dataclasses.replace(
        opt,
        spatial_lr_scale=spatial,
        max_steps=int(tree.get("max_num_iterations", cfg.max_num_iterations)),
    )

    model_tree = tree.get("pipeline", {}).get("model", {})
    model_tree = deep_merge(model_tree, tree.get("model", {}))
    splat = _apply_fields(cfg.splat, model_tree)
    densify = _apply_fields(cfg.densify, model_tree)

    dp = tree.get("dataparser", {})
    dp_kwargs = {k: v for k, v in dp.items() if k != "name"}
    cfg = dataclasses.replace(
        cfg,
        splat=splat,
        densify=densify,
        optimizers=opt,
        dataparser=dp.get("name", cfg.dataparser),
        dataparser_kwargs=dp_kwargs,
    )
    return cfg
