"""Compute per-frame ENet features (scripts/compute_multiview_features.py).

Runs the ENet trunk over every 328x256 RGB frame of every scene and writes
one .npy per frame: (128, 32, 41) feature maps, the inputs to
project_multiview_features.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--frames_root", type=str, required=True,
                   help="<root>/<scene_id>/color/<frame>.jpg layout")
    p.add_argument("--out_root", type=str, required=True)
    p.add_argument("--ckpt", type=str, default=None,
                   help="orbax checkpoint of a trained ENet (optional)")
    p.add_argument("--enet_pth", type=str, default=None,
                   help="the reference's scannetv2_enet.pth — converted via "
                        "convert_enet_checkpoint for reference-equal features")
    p.add_argument("--batch_size", type=int, default=64)
    return p.parse_args()


def load_image(path, size=(328, 256)):
    """Aspect-preserving resize (NEAREST) + center crop + ScanNet-stats
    normalization, exactly the reference's _resize_crop_image/_load_image
    (scripts/compute_multiview_features.py:59-79)."""
    import math

    from PIL import Image
    img = Image.open(path).convert("RGB")
    w, h = img.size
    new_w, new_h = size
    if (w, h) != (new_w, new_h):
        resize_width = int(math.floor(new_h * float(w) / float(h)))
        img = img.resize((resize_width, new_h), Image.NEAREST)
        left = (resize_width - new_w) // 2
        img = img.crop((left, 0, left + new_w, new_h))
    arr = np.asarray(img, np.float32) / 255.0
    mean = np.array([0.496342, 0.466664, 0.440796], np.float32)
    std = np.array([0.277856, 0.28623, 0.291129], np.float32)
    return (arr - mean) / std


def main():
    import jax
    import jax.numpy as jnp
    from scan2cap_tpu.models.enet import ENetEncoder
    from scan2cap_tpu.train.checkpoints import CheckpointIO

    args = parse_args()
    model = ENetEncoder()
    dummy = jnp.zeros((1, 256, 328, 3))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), dummy, train=False)
    if args.enet_pth:
        from scan2cap_tpu.convert import convert_enet_checkpoint
        params, stats = convert_enet_checkpoint(args.enet_pth)
        variables = {"params": params, "batch_stats": stats}
    elif args.ckpt:
        variables = CheckpointIO(args.ckpt).restore("best", dict(variables))

    @jax.jit
    def forward(x):
        return model.apply(variables, x, train=False)

    scenes = sorted(os.listdir(args.frames_root))
    for scene_id in scenes:
        color_dir = os.path.join(args.frames_root, scene_id, "color")
        if not os.path.isdir(color_dir):
            continue
        out_dir = os.path.join(args.out_root, scene_id)
        os.makedirs(out_dir, exist_ok=True)
        frames = sorted(os.listdir(color_dir))
        for i in range(0, len(frames), args.batch_size):
            chunk = frames[i:i + args.batch_size]
            imgs = np.stack([load_image(os.path.join(color_dir, f))
                             for f in chunk])
            feats = np.asarray(forward(jnp.asarray(imgs)))   # (B, 32, 41, 128)
            for f, feat in zip(chunk, feats):
                frame_id = os.path.splitext(f)[0]
                # store channels-first to match the reference layout
                np.save(os.path.join(out_dir, frame_id + ".npy"),
                        np.transpose(feat, (2, 0, 1)))
        print(f"{scene_id}: {len(frames)} frames")


if __name__ == "__main__":
    main()
