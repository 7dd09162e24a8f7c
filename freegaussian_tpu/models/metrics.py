"""Image metrics: PSNR/SSIM (jax) + LPIPS.

The reference computes PSNR/SSIM/LPIPS per eval image
(freegaussian_model.py:1005-1051). LPIPS needs a pretrained AlexNet backbone
plus the learned per-channel calibration weights; this environment has zero
egress and no torchvision/torchmetrics, so:

  - `lpips()` runs a JAX-native AlexNet-LPIPS when a local weights file is
    available (env FREEGAUSSIAN_LPIPS_WEIGHTS or
    ~/.cache/freegaussian/lpips_alex.npz; export one with
    scripts/export_lpips_weights.py on any machine that has the `lpips` pip
    package, then copy it over);
  - otherwise it returns None, and eval reports carry an EXPLICIT
    `"lpips": "unavailable"` field (never a silent omission).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import numpy as np

_lpips_fn = None  # None = not initialized; False = unavailable
_lpips_warned = False

# AlexNet-LPIPS architecture constants (lpips v0.1 'alex' net):
# conv (out_ch, kernel, stride, pad) for the 5 feature slices; a 3x3/2
# max-pool follows slices 0 and 1.
_ALEX_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
# input scaling layer constants (lpips ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def default_weights_path() -> Path:
    env = os.environ.get("FREEGAUSSIAN_LPIPS_WEIGHTS", "")
    if env:
        return Path(env)
    return Path(os.path.expanduser("~/.cache/freegaussian/lpips_alex.npz"))


def _build_lpips(weights: dict):
    """Compile the LPIPS forward from a weights dict with keys
    conv{i}_w (O,I,Kh,Kw), conv{i}_b (O,), lin{i} (C,) for i in 0..4."""
    import jax
    import jax.numpy as jnp

    convs = [
        (jnp.asarray(weights[f"conv{i}_w"]), jnp.asarray(weights[f"conv{i}_b"]))
        for i in range(5)
    ]
    lins = [jnp.asarray(weights[f"lin{i}"]).reshape(-1) for i in range(5)]

    def features(x):
        # x: (1, 3, H, W) in [-1, 1]
        x = (x - _SHIFT.reshape(1, 3, 1, 1)) / _SCALE.reshape(1, 3, 1, 1)
        taps = []
        for i, ((w, b), (oc, k, s, p)) in enumerate(zip(convs, _ALEX_CONVS)):
            x = jax.lax.conv_general_dilated(
                x, w, (s, s), [(p, p), (p, p)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + b.reshape(1, -1, 1, 1)
            x = jax.nn.relu(x)
            taps.append(x)
            if i < 2:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                    "VALID",
                )
        return taps

    def lpips_pair(a, b):
        ta, tb = features(a), features(b)
        total = 0.0
        for fa, fb, lin in zip(ta, tb, lins):
            # lpips normalize_tensor puts eps OUTSIDE the sqrt
            # (norm_factor + 1e-10) — match it exactly so exported
            # pretrained weights reproduce the package's numbers.
            na = fa / (jnp.sqrt(jnp.sum(fa**2, axis=1, keepdims=True)) + 1e-10)
            nb = fb / (jnp.sqrt(jnp.sum(fb**2, axis=1, keepdims=True)) + 1e-10)
            d = (na - nb) ** 2  # (1, C, h, w)
            # learned 1x1 conv (non-negative weights), then spatial average
            total = total + jnp.mean(
                jnp.sum(d * lin.reshape(1, -1, 1, 1), axis=1)
            )
        return total

    return jax.jit(lpips_pair)


def _init_lpips():
    global _lpips_fn
    if _lpips_fn is not None:
        return
    path = default_weights_path()
    if not path.exists():
        _lpips_fn = False
        return
    try:
        weights = dict(np.load(path))
        _lpips_fn = _build_lpips(weights)
    except Exception as e:  # noqa: BLE001
        import warnings

        warnings.warn(f"LPIPS weights at {path} failed to load: {e}")
        _lpips_fn = False


def lpips_available() -> bool:
    _init_lpips()
    return _lpips_fn is not False


def lpips(pred: np.ndarray, gt: np.ndarray) -> Optional[float]:
    """LPIPS (alex) between (H, W, 3) float images in [0, 1]; None when the
    pretrained weights are unavailable (the caller must then record
    `"lpips": "unavailable"` — freegaussian_model.py:1005-1051 makes LPIPS a
    headline eval metric)."""
    global _lpips_warned
    _init_lpips()
    if _lpips_fn is False:
        if not _lpips_warned:
            import warnings

            warnings.warn(
                f"LPIPS weights not found at {default_weights_path()}; eval "
                "reports will carry lpips='unavailable' (export weights with "
                "scripts/export_lpips_weights.py)"
            )
            _lpips_warned = True
        return None
    a = np.transpose(np.clip(pred, 0, 1) * 2 - 1, (2, 0, 1))[None].astype(np.float32)
    b = np.transpose(np.clip(gt, 0, 1) * 2 - 1, (2, 0, 1))[None].astype(np.float32)
    return float(_lpips_fn(a, b))
