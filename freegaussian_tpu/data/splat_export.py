"""Export trained Gaussians in the standard INRIA-3DGS PLY layout
(x y z nx ny nz f_dc_* f_rest_* opacity scale_* rot_*), loadable by the
ecosystem of splat web viewers — the practical replacement for the
reference's bundled SMERF-style demo viewer (docs/viewer, project-page only).

Note the layout caveat the reference documents (freegaussian_model.py:110-119):
PLYs exported from `antialiased` rasterize mode are not compatible with
classic-mode viewers."""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def export_splat_ply(path: Path, params, alive, gaussian_mask=None) -> int:
    """Write live Gaussians; returns the number written. Field semantics:
    raw (pre-activation) log-scales / logit-opacities / unnormalized quats,
    matching the INRIA checkpoint convention.

    `gaussian_mask` (N, M) bool (the stage-2 clustering vote) appends one
    extra `property float atrb` = 1 + first attribute index (0 = static
    background). Extra trailing properties are ignored by name-driven
    ecosystem viewers; docs/viewer/index.html builds per-attribute control
    sliders from it (the web-demo face of the control story)."""
    alive_np = np.asarray(alive)
    means = np.asarray(params["means"])[alive_np]
    scales = np.asarray(params["scales"])[alive_np]
    quats = np.asarray(params["quats"])[alive_np]
    f_dc = np.asarray(params["features_dc"])[alive_np]
    f_rest = np.asarray(params["features_rest"])[alive_np]  # flat (N, (K-1)*3)
    opac = np.asarray(params["opacities"])[alive_np]
    n = means.shape[0]
    k_rest = f_rest.shape[1] // 3  # explicit: -1 inference fails at n == 0
    f_rest = f_rest.reshape(n, k_rest, 3)  # (N, K-1, 3)

    # INRIA layout stores rest coefficients channel-major: (3, K-1) flattened.
    f_rest_flat = f_rest.transpose(0, 2, 1).reshape(n, -1)

    props = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(3 * k_rest)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    cols = [
        means,
        np.zeros((n, 3), np.float32),
        f_dc,
        f_rest_flat,
        opac.reshape(n, 1),
        scales,
        quats,
    ]
    if gaussian_mask is not None:
        gm = np.asarray(gaussian_mask)[alive_np]  # (n, M) bool
        atrb = np.where(gm.any(-1), gm.argmax(-1) + 1, 0).astype(np.float32)
        props = props + ["atrb"]
        cols.append(atrb.reshape(n, 1))
    header = (
        ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
        + [f"property float {p}" for p in props]
        + ["end_header"]
    )
    data = np.concatenate(cols, axis=-1).astype("<f4")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(data.tobytes())
    return n


def import_splat_ply(path: Path):
    """Read an INRIA-layout splat PLY back into a (params, n) pair."""
    with open(path, "rb") as f:
        assert f.readline().strip() == b"ply"
        n = 0
        props = []
        while True:
            line = f.readline().strip().decode()
            if line == "end_header":
                break
            parts = line.split()
            if parts[0] == "element" and parts[1] == "vertex":
                n = int(parts[2])
            elif parts[0] == "property":
                props.append(parts[2])
        arr = np.frombuffer(f.read(4 * n * len(props)), dtype="<f4").reshape(n, len(props))
    col = {p: i for i, p in enumerate(props)}
    k_rest = sum(1 for p in props if p.startswith("f_rest_")) // 3
    f_rest = arr[:, [col[f"f_rest_{i}"] for i in range(3 * k_rest)]]
    params = {
        "means": arr[:, [col["x"], col["y"], col["z"]]],
        "features_dc": arr[:, [col["f_dc_0"], col["f_dc_1"], col["f_dc_2"]]],
        # channel-major PLY layout -> in-memory flat (N, (K-1)*3),
        # coefficient-major (models/gaussians.py convention)
        "features_rest": np.ascontiguousarray(
            f_rest.reshape(n, 3, k_rest).transpose(0, 2, 1)
        ).reshape(n, 3 * k_rest),
        "opacities": arr[:, [col["opacity"]]],
        "scales": arr[:, [col["scale_0"], col["scale_1"], col["scale_2"]]],
        "quats": arr[:, [col[f"rot_{i}"] for i in range(4)]],
    }
    return params, n
