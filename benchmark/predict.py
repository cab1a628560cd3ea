"""Benchmark prediction CLI — rebuild of /root/reference/benchmark/predict.py.

Runs a trained CapNet over the val/test scenes and dumps
``outputs/<folder>/pred.json``: per scene a list of
{"caption", "box" (8,3), "sem_prob" (18,), "obj_prob" (2,)} for every
proposal surviving NMS ∧ objectness (predict.py:192-233).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--folder", type=str, required=True)
    p.add_argument("--dataset", type=str, default="ScanRefer")
    p.add_argument("--split", type=str, default="val")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args()


def predict_caption(args):
    import jax
    import jax.numpy as jnp

    from scan2cap_tpu.config import Config, PathConfig
    from scan2cap_tpu.data.dataset import (
        ScannetReferenceDataset, Loader, get_scanrefer)
    from scan2cap_tpu.models import CapNet
    from scan2cap_tpu.train import create_train_state, make_eval_step
    from scan2cap_tpu.train.checkpoints import CheckpointIO
    from scan2cap_tpu.eval.eval_helper import decode_caption
    from scan2cap_tpu.eval.ap_helper import parse_predictions_device

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    from train import model_config_from_info

    paths = PathConfig()
    folder = os.path.join(paths.output, args.folder)
    with open(os.path.join(folder, "info.json")) as f:
        info = json.load(f)
    mcfg = model_config_from_info(info)
    cfg = Config(model=mcfg)

    train_path = os.path.join(paths.data, f"{args.dataset}_filtered_train.json")
    split_path = os.path.join(paths.data,
                              f"{args.dataset}_filtered_{args.split}.json")
    scanrefer_train, _, _, _ = get_scanrefer(train_path, split_path)
    with open(split_path) as f:
        split_data = json.load(f)
    # benchmark runs scene*_00 only (predict.py:115-119)
    scene_list = sorted({d["scene_id"] for d in split_data
                         if d["scene_id"].endswith("_00")})
    by_scene = {}
    for d in split_data:
        by_scene.setdefault(d["scene_id"], d)
    eval_entries = [by_scene[s] for s in scene_list]

    common = dict(
        scannet_data_dir=paths.scannet_data, glove_path=paths.glove,
        num_points=mcfg.num_points, use_height=mcfg.use_height,
        use_color=mcfg.use_color, use_normal=mcfg.use_normal,
        use_multiview=mcfg.use_multiview, multiview_path=paths.multiview)
    # the vocabulary comes from the TRAIN split's tokens + glove alone — a
    # full train ScannetReferenceDataset would eagerly np.load every train
    # scene's four .npy arrays (minutes of fresh-page faults on this host
    # class) just to reach these three attributes
    from scan2cap_tpu.data.vocab import build_vocabulary, load_glove
    glove = load_glove(paths.glove)
    vocabulary = build_vocabulary(scanrefer_train, glove)
    ds = ScannetReferenceDataset(
        eval_entries, scene_list, split=args.split, augment=False,
        vocab=vocabulary, glove=glove, **common)
    loader = Loader(ds, args.batch_size, shuffle=False, seed=args.seed,
                    drop_last=False)

    model = CapNet(mcfg, num_vocabs=ds.num_vocabs,
                   num_vocabs_padded=int(info.get("num_vocabs_padded", 0)
                                         or 0))
    example = next(iter(loader))
    example = {k: jnp.asarray(v) for k, v in example.items()}
    example["glove_emb_table"] = jnp.asarray(ds.emb_table)
    state = create_train_state(cfg, model, example, jax.random.PRNGKey(args.seed))
    restored = CheckpointIO(os.path.join(folder, "ckpt")).restore_best_or_last(
        {"params": state.params, "batch_stats": state.batch_stats})
    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"])
    eval_step = make_eval_step(cfg, model, detection_loss=False)

    outputs = {}
    idx2word = ds.vocabulary["idx2word"]
    for batch in loader:
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        jbatch["glove_emb_table"] = jnp.asarray(ds.emb_table)
        out = eval_step(state, jbatch)
        obj_prob = jax.nn.softmax(out["objectness_scores"], axis=-1)
        sem_prob = jax.nn.softmax(out["sem_cls_scores"], axis=-1)
        # remove_empty_box + class-NMS on device (the reference's POST_DICT
        # path, benchmark/predict.py:161-192): the input cloud must be wired
        # through since eval_step's keep_keys drop it
        parsed = parse_predictions_device(
            {**out, "point_clouds": jbatch["point_clouds"]})
        keep = np.asarray(parsed["pred_mask"]
                          & (jnp.argmax(out["objectness_scores"], -1) == 1))
        corners = np.asarray(out["bbox_corner"])
        caps = np.asarray(out["lang_cap"])
        obj_prob = np.asarray(obj_prob)
        sem_prob = np.asarray(sem_prob)
        for b in range(keep.shape[0]):
            scene_id = ds.scanrefer[int(batch["dataset_idx"][b])]["scene_id"]
            entries = []
            for k in np.where(keep[b])[0]:
                entries.append({
                    "caption": decode_caption(caps[b, k], idx2word),
                    "box": corners[b, k].tolist(),
                    "sem_prob": sem_prob[b, k].tolist(),
                    "obj_prob": obj_prob[b, k].tolist(),
                })
            outputs[scene_id] = entries

    out_path = os.path.join(folder, "pred.json")
    with open(out_path, "w") as f:
        json.dump(outputs, f)
    print(f"saved predictions for {len(outputs)} scenes to {out_path}")


if __name__ == "__main__":
    args = parse_args()
    np.random.seed(args.seed)
    predict_caption(args)
