"""Image metrics: PSNR/SSIM (jax) + LPIPS via torchmetrics on host CPU.

The reference computes PSNR/SSIM/LPIPS per eval image
(freegaussian_model.py:1005-1051). LPIPS needs the pretrained AlexNet/VGG
from torchmetrics; it runs on host CPU over the final rendered arrays (eval
only, never in the train loop)."""

from __future__ import annotations

from typing import Optional

import numpy as np

_lpips_model = None
_lpips_warned = False


def lpips(pred: np.ndarray, gt: np.ndarray) -> Optional[float]:
    """LPIPS(normalize=True) between (H, W, 3) float images in [0, 1].

    Returns None if torchmetrics/weights are unavailable (zero-egress
    environments can't fetch the pretrained net) — with a one-time warning,
    since LPIPS is one of the reference's headline eval metrics
    (freegaussian_model.py:1005-1051)."""
    global _lpips_model, _lpips_warned
    try:
        import torch
        from torchmetrics.image.lpip import LearnedPerceptualImagePatchSimilarity

        if _lpips_model is None:
            _lpips_model = LearnedPerceptualImagePatchSimilarity(normalize=True)
        a = torch.from_numpy(np.asarray(pred, np.float32)).permute(2, 0, 1)[None]
        b = torch.from_numpy(np.asarray(gt, np.float32)).permute(2, 0, 1)[None]
        with torch.no_grad():
            return float(_lpips_model(a.clamp(0, 1), b.clamp(0, 1)))
    except Exception as e:  # noqa: BLE001
        if not _lpips_warned:
            import warnings

            warnings.warn(
                f"LPIPS unavailable ({type(e).__name__}: {e}); eval results "
                "will omit the lpips metric"
            )
            _lpips_warned = True
        return None
