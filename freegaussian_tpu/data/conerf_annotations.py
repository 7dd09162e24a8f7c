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


def coco_num_attributes(path: Path) -> int:
    """Number of articulated attributes in a COCO annotation file: the max
    category id (1-based categories map to 0-based attributes)."""
    tree = json.loads(Path(path).read_text())
    cats = [int(c["id"]) for c in tree.get("categories", [])]
    if not cats:
        cats = [int(a.get("category_id", 1)) for a in tree.get("annotations", [])]
    return max(cats, default=0)


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


def load_blender_annotations(
    ann_dir: Path, fids, height: int, width: int, num_attributes: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Blender-exported `{fid}_segmentation.npy` masks -> (N, H, W, M+1) bool
    stacks + (N, 1) validity, mirroring the reference loader
    (freegaussian_dataparser.py:241-265): channel layout [attrs..., background],
    background = pixels with no attribute."""
    atrb_masks, mask_valids = [], []
    for fid in fids:
        labels = np.zeros((height, width, num_attributes + 1), np.bool_)
        seg_path = Path(ann_dir) / f"{fid}_segmentation.npy"
        if not seg_path.exists() or num_attributes == 0:
            valids = np.zeros(1, np.bool_)
        else:
            seg = np.load(seg_path)
            labels[..., :num_attributes] = seg[..., :num_attributes]
            labels[labels.sum(axis=-1) == 0, -1] = True
            valids = np.ones(1, np.bool_)
        atrb_masks.append(labels)
        mask_valids.append(valids)
    return np.stack(atrb_masks), np.stack(mask_valids)


def load_conerf_values_yaml(
    path: Path, fids, num_attributes: int, norm_vals: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Reference-format per-frame attribute states: a YAML list of
    {frame, class, value} entries (freegaussian_dataparser.py:268-286).
    Returns (atrb_vals (N, M+1), atrb_val_masks (N, M+1)); values mapped
    0.5*(v+1) like the reference, column 0 reserved for background."""
    import yaml

    entries = yaml.safe_load(Path(path).read_text()) or []
    fid_to_row = {int(fid): i for i, fid in enumerate(fids)}
    vals = np.zeros((len(fids), num_attributes), np.float32)
    val_masks = np.zeros((len(fids), num_attributes + 1), np.float32)
    val_masks[..., -1] = True
    for entry in entries:
        fid, cls = int(entry["frame"]), int(entry["class"])
        if fid in fid_to_row:
            vals[fid_to_row[fid]][cls] = float(entry["value"])
            val_masks[fid_to_row[fid]][cls] = True
    vals = 0.5 * (vals + 1)
    vals = np.hstack([np.zeros((vals.shape[0], 1), np.float32), vals])
    return vals, val_masks
