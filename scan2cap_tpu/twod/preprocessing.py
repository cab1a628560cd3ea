"""2D feature extraction (Scan2Cap-2D/preprocessing/model.py + utils.py).

Builds the HDF5 databases the 2D datasets consume: a 2048-d global feature
per rendered viewpoint plus 2052-d (feature + 4 normalized box coords)
per target/context box.  Backbone: a ResNet-style encoder — the reference
uses torchvision ResNet101; this image has no torchvision, so the extractor
accepts any callable (B, H, W, 3) -> (B, 2048); ``make_resnet_extractor``
builds one from ``transformers`` (microsoft/resnet-50/101) when its weights
are available locally, else a patch-pooled linear fallback so the pipeline
stays runnable end-to-end offline.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


def make_resnet_extractor(model_name: str = "microsoft/resnet-101",
                          pth: Optional[str] = None):
    """Returns fn(images (B,H,W,3) float [0,1]) -> (B, 2048) features.

    The returned callable carries a ``.backend`` attribute ("resnet:pth",
    "resnet:<model>" or "random-projection-fallback") that
    ``build_database`` records in the HDF5 so downstream numbers are
    attributable.

    ``pth`` (also honored via $SCAN2CAP_RESNET_PTH) loads a torchvision
    ``resnet101`` checkpoint file directly — the offline route to faithful
    features on a host without torchvision or network (the reference's
    extractor is torchvision resnet101, Scan2Cap-2D/preprocessing/
    model.py:6-57)."""
    pth = pth or os.environ.get("SCAN2CAP_RESNET_PTH")
    if pth:
        from scan2cap_tpu.twod.resnet import make_pth_extractor
        return make_pth_extractor(pth)
    try:
        import torch
        from transformers import AutoModel

        # cache-first (local_files_only fails FAST when the weights aren't
        # cached — otherwise transformers waits out network timeouts), then
        # a real download attempt unless the environment is marked offline;
        # a plain local_files_only=True would silently strand internet-
        # connected hosts on the meaningless random-projection fallback
        try:
            model = AutoModel.from_pretrained(model_name,
                                              local_files_only=True)
        except Exception:
            if (os.environ.get("HF_HUB_OFFLINE")
                    or os.environ.get("TRANSFORMERS_OFFLINE")):
                raise
            model = AutoModel.from_pretrained(model_name)
        model.eval()

        def extract(images: np.ndarray) -> np.ndarray:
            mean = np.array([0.485, 0.456, 0.406], np.float32)
            std = np.array([0.229, 0.224, 0.225], np.float32)
            x = (images - mean) / std
            x = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
            with torch.no_grad():
                out = model(x).pooler_output  # (B, 2048, 1, 1)
            return out.reshape(len(images), -1).numpy()

        extract.backend = f"resnet:{model_name}"
        return extract
    except Exception:
        # offline fallback: fixed random projection of 8x8 patch means —
        # keeps the whole 2D pipeline runnable without pretrained weights.
        # These features carry NO semantics: any caption/retrieval metric
        # computed from them is meaningless except as a pipeline smoke test.
        import sys
        print("[twod.preprocessing] WARNING: no pretrained ResNet available "
              "— using the random-projection fallback extractor; resulting "
              "2D baseline metrics are NOT meaningful", file=sys.stderr)
        rs = np.random.RandomState(0)
        proj = rs.randn(8 * 8 * 3, 2048).astype(np.float32) / np.sqrt(192)

        def extract(images: np.ndarray) -> np.ndarray:
            B, H, W, _ = images.shape
            ph, pw = H // 8, W // 8
            pooled = images[:, :ph * 8, :pw * 8].reshape(
                B, 8, ph, 8, pw, 3).mean((2, 4))
            return pooled.reshape(B, -1) @ proj

        extract.backend = "random-projection-fallback"
        return extract


def box_feature(crop_feat: np.ndarray, box: Sequence[float],
                width: int, height: int) -> np.ndarray:
    """2052-d: 2048 crop feature + normalized (x1, y1, x2, y2)."""
    x1, y1, x2, y2 = box
    coords = np.asarray([x1 / width, y1 / height, x2 / width, y2 / height],
                        np.float32)
    return np.concatenate([crop_feat.astype(np.float32), coords])


def build_database(
    out_path: str,
    samples: Sequence[dict],
    load_image: Callable[[dict], np.ndarray],
    load_boxes: Callable[[dict], List[dict]],
    extractor: Optional[Callable] = None,
    width: int = 320,
    height: int = 240,
):
    """Write the HDF5 database.

    samples: ScanRefer-style entries; load_image(entry) -> (H, W, 3) float;
    load_boxes(entry) -> [{"box": (4,), "is_target": bool}, ...].
    """
    import h5py
    from scan2cap_tpu.twod.dataset import sample_id_of

    extract = extractor or make_resnet_extractor()
    with h5py.File(out_path, "w") as db:
        # which extractor produced these features is part of the artifact
        db.attrs["extractor_backend"] = getattr(extract, "backend", "custom")
        for entry in samples:
            sid = sample_id_of(entry)
            if sid in db:
                continue
            img = load_image(entry)
            g_feat = extract(img[None])[0]
            boxes = load_boxes(entry)
            t_feat = None
            c_feats = []
            for b in boxes:
                x1, y1, x2, y2 = [int(v) for v in b["box"]]
                # clamp INTO the image before slicing: a negative end
                # coordinate (detector box outside the render) would slice
                # img[0:-5] — nearly the whole frame — instead of hitting
                # the degenerate-crop fallback below
                h, w = img.shape[:2]
                y1c, y2c = np.clip([y1, y2], 0, h)
                x1c, x2c = np.clip([x1, x2], 0, w)
                if y2c <= y1c or x2c <= x1c:
                    crop = img      # degenerate/outside box: whole frame
                else:
                    crop = img[y1c:y2c, x1c:x2c]
                # resize crop to 64x64 by nearest sampling (no PIL dependency)
                yy = (np.linspace(0, crop.shape[0] - 1, 64)).astype(int)
                xx = (np.linspace(0, crop.shape[1] - 1, 64)).astype(int)
                crop64 = crop[yy][:, xx]
                feat = box_feature(extract(crop64[None])[0], b["box"],
                                   width, height)
                if b.get("is_target"):
                    t_feat = feat
                else:
                    c_feats.append(feat)
            grp = db.create_group(sid)
            grp["g_feat"] = g_feat
            grp["t_feat"] = t_feat if t_feat is not None else np.zeros(
                2052, np.float32)
            grp["c_feats"] = (np.stack(c_feats) if c_feats
                              else np.zeros((0, 2052), np.float32))
    return out_path
