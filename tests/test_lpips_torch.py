"""Architecture-exact LPIPS validation vs an independent torch build.

No pretrained weights exist in this zero-egress environment (VERDICT r3
missing #4), so the conv/pool/normalize/calibration PLUMBING is validated
instead: the same AlexNet-LPIPS (lpips v0.1 'alex' topology, the metric the
reference reports at freegaussian_model.py:1032-1038) is built in torch from
the published architecture, both sides share the same RANDOM weights, and
the JAX forward must match torch to tolerance. Loading real exported weights
(scripts/export_lpips_weights.py) then changes only the parameter values,
not any code path tested here.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from freegaussian_tpu.models import metrics as M


def _random_weights(seed=0):
    rng = np.random.default_rng(seed)
    weights = {}
    in_ch = 3
    for i, (out_ch, k, _s, _p) in enumerate(M._ALEX_CONVS):
        weights[f"conv{i}_w"] = rng.normal(
            scale=1.0 / np.sqrt(in_ch * k * k), size=(out_ch, in_ch, k, k)
        ).astype(np.float32)
        weights[f"conv{i}_b"] = rng.normal(scale=0.05, size=(out_ch,)).astype(
            np.float32
        )
        weights[f"lin{i}"] = rng.uniform(0, 0.2, size=(out_ch,)).astype(np.float32)
        in_ch = out_ch
    return weights


def _torch_lpips(weights, a, b):
    """Independent torch re-derivation of the lpips 'alex' forward:
    ScalingLayer -> torchvision-AlexNet feature slices (3x3/2 max-pool opens
    slices 2 and 3) -> channel-unit-normalize -> squared diff -> 1x1
    non-negative calibration conv -> spatial mean -> sum over the 5 taps."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def features(x):
        x = (x - shift) / scale
        taps = []
        for i, (_oc, _k, s, p) in enumerate(M._ALEX_CONVS):
            if i in (1, 2):  # max-pool opens slices 2 and 3
                x = F.max_pool2d(x, kernel_size=3, stride=2)
            w = torch.from_numpy(weights[f"conv{i}_w"])
            bias = torch.from_numpy(weights[f"conv{i}_b"])
            x = F.relu(F.conv2d(x, w, bias, stride=s, padding=p))
            taps.append(x)
        return taps

    ta, tb = features(a), features(b)
    total = torch.zeros(())
    for i, (fa, fb) in enumerate(zip(ta, tb)):
        na = fa / (fa.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        nb = fb / (fb.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        lin = torch.from_numpy(weights[f"lin{i}"]).view(1, -1, 1, 1)
        total = total + (d * lin).sum(dim=1).mean()
    return float(total)


@pytest.mark.parametrize("seed", [0, 1])
def test_lpips_forward_matches_torch(seed):
    weights = _random_weights(seed)
    jax_fn = M._build_lpips(weights)

    rng = np.random.default_rng(100 + seed)
    img_a = rng.uniform(0, 1, size=(64, 64, 3)).astype(np.float32)
    img_b = np.clip(img_a + rng.normal(scale=0.1, size=img_a.shape), 0, 1).astype(
        np.float32
    )

    to_nchw = lambda im: np.transpose(im * 2 - 1, (2, 0, 1))[None]
    a = to_nchw(img_a)
    b = to_nchw(img_b)

    got = float(jax_fn(a.astype(np.float32), b.astype(np.float32)))
    want = _torch_lpips(weights, torch.from_numpy(a), torch.from_numpy(b))
    assert got == pytest.approx(want, rel=1e-4, abs=1e-6)
    assert want > 1e-6  # distinct images score nonzero


def test_lpips_identical_images_zero():
    weights = _random_weights(2)
    jax_fn = M._build_lpips(weights)
    rng = np.random.default_rng(9)
    img = rng.uniform(0, 1, size=(64, 64, 3)).astype(np.float32)
    x = np.transpose(img * 2 - 1, (2, 0, 1))[None].astype(np.float32)
    assert float(jax_fn(x, x)) == pytest.approx(0.0, abs=1e-8)
