"""Torch-checkpoint compatibility: import reference-trained checkpoints.

Loads nerfstudio `step-%09d.ckpt` files produced by the reference
(`{"pipeline": state_dict, "step": int, ...}`, paths visible in
scripts/run_control.sh:16-40), strips DDP `module.` / `_model.` prefixes
exactly like FreeGaussianControlModel.load_deformable_checkpoint
(freegaussian_control_model.py:34-50), and converts:

  - gauss_params.{means,scales,quats,features_dc,features_rest,opacities}
    -> padded-capacity arrays + alive mask
  - deform.* (timenet / linear trunk / branch_w / branch_v /
    gaussian_rotation / gaussian_scaling) -> flax DeformField variables
  - control.* -> flax ControlField variables

torch Linear weights are (out, in); flax kernels are (in, out)."""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _strip_prefixes(pipeline_state: Dict[str, Any]) -> Dict[str, Any]:
    state = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in pipeline_state.items()
    }
    model_state = {}
    is_ddp = True
    for k, v in state.items():
        if k.startswith("_model."):
            model_state[k[len("_model."):]] = v
            if not k.startswith("_model.module."):
                is_ddp = False
    if is_ddp and model_state:
        model_state = {k[len("module."):]: v for k, v in model_state.items()}
    return model_state


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _linear(state: Dict, name: str) -> Dict[str, jnp.ndarray]:
    w = _np(state[f"{name}.weight"])
    b = _np(state[f"{name}.bias"])
    return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}


def deform_vars_from_torch(state: Dict[str, Any], *, is_blender: bool = True):
    """Map reference deform MLP weights onto DeformField's flax layout.

    Creation order in DeformField.__call__: timenet (2 layers, blender only),
    trunk (depth=8), branch_w, branch_v, gaussian_rotation, gaussian_scaling.
    """
    layers = {}
    i = 0
    if is_blender:
        layers[f"TorchLinear_{i}"] = _linear(state, "deform.timenet.0"); i += 1
        layers[f"TorchLinear_{i}"] = _linear(state, "deform.timenet.2"); i += 1
    for d in range(8):
        layers[f"TorchLinear_{i}"] = _linear(state, f"deform.linear.{d}"); i += 1
    layers[f"TorchLinear_{i}"] = _linear(state, "deform.branch_w"); i += 1
    layers[f"TorchLinear_{i}"] = _linear(state, "deform.branch_v"); i += 1
    layers[f"TorchLinear_{i}"] = _linear(state, "deform.gaussian_rotation"); i += 1
    layers[f"TorchLinear_{i}"] = _linear(state, "deform.gaussian_scaling"); i += 1
    return {"params": layers}


def control_vars_from_torch(state: Dict[str, Any]):
    """Creation order in ControlField.__call__: trunk (8), d_xyz, d_rot, d_scale."""
    layers = {}
    i = 0
    for d in range(8):
        layers[f"TorchLinear_{i}"] = _linear(state, f"control.linear.{d}"); i += 1
    layers[f"TorchLinear_{i}"] = _linear(state, "control.d_xyz"); i += 1
    layers[f"TorchLinear_{i}"] = _linear(state, "control.d_rot"); i += 1
    layers[f"TorchLinear_{i}"] = _linear(state, "control.d_scale"); i += 1
    return {"params": layers}


def gauss_params_from_torch(
    state: Dict[str, Any], capacity: Optional[int] = None
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """gauss_params.* -> padded param dict + alive mask. Supports both the
    `gauss_params.means` and legacy bare `means` key layouts
    (freegaussian_model.py:278-291)."""
    names = ["means", "scales", "quats", "features_dc", "features_rest", "opacities"]
    out = {}
    for name in names:
        key = f"gauss_params.{name}" if f"gauss_params.{name}" in state else name
        out[name] = _np(state[key]).astype(np.float32)
    n = out["means"].shape[0]
    # torch stores rest SH coefficients as (N, K-1, 3); in-memory they are
    # flat (N, (K-1)*3) — see models/gaussians.py. Explicit shape: -1
    # inference fails for zero-gaussian checkpoints.
    fr = out["features_rest"]
    out["features_rest"] = fr.reshape(n, fr.shape[1] * fr.shape[2])
    cap = capacity or n
    if cap < n:
        raise ValueError(f"capacity {cap} < checkpoint gaussians {n}")
    params = {}
    for name, arr in out.items():
        pad = [(0, cap - n)] + [(0, 0)] * (arr.ndim - 1)
        params[name] = jnp.asarray(np.pad(arr, pad))
    alive = jnp.arange(cap) < n
    return params, alive


def load_reference_checkpoint(
    path: Path,
    *,
    capacity: Optional[int] = None,
    is_blender: bool = True,
    load_control: bool = True,
):
    """Load a reference torch checkpoint file. Returns a dict with
    params/alive/deform_vars/control_vars/step."""
    import torch

    loaded = torch.load(Path(path), map_location="cpu", weights_only=False)
    model_state = _strip_prefixes(loaded["pipeline"])
    params, alive = gauss_params_from_torch(model_state, capacity)
    result = {
        "params": params,
        "alive": alive,
        "deform_vars": deform_vars_from_torch(model_state, is_blender=is_blender),
        "step": int(loaded.get("step", 0)),
    }
    if load_control and any(k.startswith("control.") for k in model_state):
        result["control_vars"] = control_vars_from_torch(model_state)
    return result


# -----------------------------------------------------------------------------
# Export: our TrainState -> reference-format torch checkpoint (the reverse of
# load_reference_checkpoint), so TPU-trained models drop back into the
# nerfstudio/gsplat ecosystem (ns-eval, ns-render, the reference's preprocess
# tools). Inverse of the name maps above; flax kernels (in, out) -> torch
# Linear weights (out, in).
# -----------------------------------------------------------------------------


def _linear_to_torch(out: Dict[str, Any], flax_layer, name: str) -> None:
    import torch

    out[f"{name}.weight"] = torch.from_numpy(
        np.asarray(flax_layer["kernel"]).T.copy()
    )
    out[f"{name}.bias"] = torch.from_numpy(np.asarray(flax_layer["bias"]).copy())


def deform_vars_to_torch(variables, *, is_blender: bool = True) -> Dict[str, Any]:
    layers = variables["params"]
    out: Dict[str, Any] = {}
    i = 0
    if is_blender:
        _linear_to_torch(out, layers[f"TorchLinear_{i}"], "deform.timenet.0"); i += 1
        _linear_to_torch(out, layers[f"TorchLinear_{i}"], "deform.timenet.2"); i += 1
    for d in range(8):
        _linear_to_torch(out, layers[f"TorchLinear_{i}"], f"deform.linear.{d}"); i += 1
    _linear_to_torch(out, layers[f"TorchLinear_{i}"], "deform.branch_w"); i += 1
    _linear_to_torch(out, layers[f"TorchLinear_{i}"], "deform.branch_v"); i += 1
    _linear_to_torch(out, layers[f"TorchLinear_{i}"], "deform.gaussian_rotation"); i += 1
    _linear_to_torch(out, layers[f"TorchLinear_{i}"], "deform.gaussian_scaling"); i += 1
    return out


def control_vars_to_torch(variables) -> Dict[str, Any]:
    layers = variables["params"]
    out: Dict[str, Any] = {}
    i = 0
    for d in range(8):
        _linear_to_torch(out, layers[f"TorchLinear_{i}"], f"control.linear.{d}"); i += 1
    _linear_to_torch(out, layers[f"TorchLinear_{i}"], "control.d_xyz"); i += 1
    _linear_to_torch(out, layers[f"TorchLinear_{i}"], "control.d_rot"); i += 1
    _linear_to_torch(out, layers[f"TorchLinear_{i}"], "control.d_scale"); i += 1
    return out


def export_reference_checkpoint(
    path: Path,
    params: Dict[str, Any],
    alive,
    *,
    deform_vars=None,
    control_vars=None,
    step: int = 0,
    is_blender: bool = True,
) -> Path:
    """Write a nerfstudio-style `{"pipeline": state_dict, "step": N}` torch
    checkpoint holding only the LIVE Gaussians (the reference resizes to the
    checkpoint's N on load, freegaussian_model.py:278-291)."""
    import torch

    alive_np = np.asarray(alive)
    state: Dict[str, Any] = {}
    for name in ("means", "scales", "quats", "features_dc", "features_rest", "opacities"):
        arr = np.asarray(params[name])[alive_np]
        if name == "features_rest":  # flat (N, (K-1)*3) -> torch (N, K-1, 3)
            arr = arr.reshape(arr.shape[0], arr.shape[1] // 3, 3)
        state[f"_model.gauss_params.{name}"] = torch.from_numpy(arr.copy())
    if deform_vars is not None:
        for k, v in deform_vars_to_torch(deform_vars, is_blender=is_blender).items():
            state[f"_model.{k}"] = v
    if control_vars is not None:
        for k, v in control_vars_to_torch(control_vars).items():
            state[f"_model.{k}"] = v
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save({"pipeline": state, "step": int(step)}, path)
    return path
