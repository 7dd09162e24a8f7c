"""CoNeRF annotation loading: polygon / COCO masks + per-frame attribute values.

Equivalent of the reference's annotation pipeline
(freegaussian_dataparser.py:156-286): hand-annotated key frames carry M
articulated-attribute regions; polygons are rasterized into (H, W, M+1)
boolean masks (channel 0 = background = no annotation), and `values.json`
maps frame ids to per-attribute scalar states. shapely/rasterio are not
available here; polygon fill uses cv2.fillPoly."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np


def rasterize_polygons(
    polygons: List[Tuple[int, np.ndarray]],
    height: int,
    width: int,
    num_attributes: int,
) -> np.ndarray:
    """polygons: list of (attribute_index, (K, 2) xy vertices).
    Returns (H, W, M+1) bool; channel 0 is 'unannotated'."""
    import cv2

    masks = np.zeros((height, width, num_attributes + 1), bool)
    for attr, verts in polygons:
        canvas = np.zeros((height, width), np.uint8)
        pts = np.round(np.asarray(verts, np.float64)).astype(np.int32).reshape(-1, 1, 2)
        cv2.fillPoly(canvas, [pts], 1)
        masks[..., attr + 1] |= canvas.astype(bool)
    masks[..., 0] = ~masks[..., 1:].any(-1)
    return masks


def load_conerf_annotation(
    path: Path, height: int, width: int, num_attributes: int, downscale: int = 1
) -> Optional[np.ndarray]:
    """CoNeRF `annotations/{fid}.json`: {"polygons": [{"attribute": i,
    "points"|"vertices": [[x, y], ...]}, ...]} (labelme-style layouts also
    accepted via "shapes"). Coordinates are divided by `downscale` to match
    the rgb/{d}x pyramid level."""
    path = Path(path)
    if not path.exists():
        return None
    tree = json.loads(path.read_text())
    polys = []
    entries = tree.get("polygons") or tree.get("shapes") or []
    for entry in entries:
        attr = int(entry.get("attribute", entry.get("label", 0)))
        pts = entry.get("points") or entry.get("vertices") or []
        if len(pts) >= 3:
            polys.append((attr, np.asarray(pts, np.float64) / downscale))
    return rasterize_polygons(polys, height, width, num_attributes)


def load_coco_annotations(
    path: Path, height: int, width: int, num_attributes: int, downscale: int = 1
) -> Dict[str, np.ndarray]:
    """COCO-format annotations: returns {image_stem: (H, W, M+1) bool}.
    Category ids (1-based) map to attribute indices (0-based)."""
    tree = json.loads(Path(path).read_text())
    images = {img["id"]: Path(img["file_name"]).stem for img in tree.get("images", [])}
    out: Dict[str, List] = {}
    for ann in tree.get("annotations", []):
        stem = images.get(ann["image_id"])
        if stem is None:
            continue
        seg = ann.get("segmentation", [])
        attr = int(ann.get("category_id", 1)) - 1
        for poly in seg if isinstance(seg, list) else []:
            pts = np.asarray(poly, np.float64).reshape(-1, 2) / downscale
            out.setdefault(stem, []).append((attr, pts))
    return {
        stem: rasterize_polygons(polys, height, width, num_attributes)
        for stem, polys in out.items()
    }


def load_conerf_values(path: Path) -> Dict[str, np.ndarray]:
    """Per-frame scalar attribute states (`annotations/values.json` or
    `values.json`: {fid: [v_0 .. v_{M-1}]}, ref :268-286)."""
    tree = json.loads(Path(path).read_text())
    return {str(k): np.asarray(v, np.float32) for k, v in tree.items()}


def discover_num_attributes(data_dir: Path) -> int:
    """Infer M from values.json or the max attribute index in annotations."""
    data_dir = Path(data_dir)
    for cand in (data_dir / "annotations" / "values.json", data_dir / "values.json"):
        if cand.exists():
            vals = load_conerf_values(cand)
            return max((len(v) for v in vals.values()), default=0)
    best = 0
    for p in sorted((data_dir / "annotations").glob("*.json")) if (data_dir / "annotations").exists() else []:
        tree = json.loads(p.read_text())
        for entry in tree.get("polygons", []) or tree.get("shapes", []) or []:
            best = max(best, int(entry.get("attribute", 0)) + 1)
    return best
