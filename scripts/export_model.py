"""AOT model export for serving (green-field; the reference has no serving
story — inference is scripts/eval.py re-running Python).

Serializes the jitted CapNet eval step (detection + all-proposal caption
decode, weights baked in) to a portable StableHLO artifact via jax.export:
the serving side needs only jax — no model code, datasets, or configs — and
can run it on TPU, GPU, or CPU.  Tokens come back as int32 ids plus box
corners and objectness (the device→host-lean output contract of
models/caption.py).

Run:  python scripts/export_model.py --folder <run> --out model.stablehlo
Load: python scripts/export_model.py --load model.stablehlo --check
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
    p.add_argument("--folder", type=str, default=None,
                   help="trained run folder (ckpt/ + info.json)")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--load", type=str, default=None,
                   help="deserialize an exported artifact instead")
    p.add_argument("--check", action="store_true",
                   help="after --load, run it on random inputs")
    return p.parse_args()


def build_and_export(args):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from scan2cap_tpu.config import Config, PathConfig
    from scan2cap_tpu.data.dataset import (
        ScannetReferenceDataset, get_scanrefer)
    from scan2cap_tpu.models import CapNet
    from scan2cap_tpu.train import create_train_state
    from scan2cap_tpu.train.checkpoints import CheckpointIO

    sys.path.insert(0, os.path.dirname(__file__))
    from train import model_config_from_info

    paths = PathConfig()
    folder = os.path.join(paths.output, args.folder)
    with open(os.path.join(folder, "info.json")) as f:
        info = json.load(f)
    targs = argparse.Namespace(**info)
    mcfg = model_config_from_info(info)
    cfg = Config(model=mcfg)

    train_path = os.path.join(paths.data,
                              f"{targs.dataset}_filtered_train.json")
    val_path = os.path.join(paths.data, f"{targs.dataset}_filtered_val.json")
    scanrefer_train, _, _, all_scenes = get_scanrefer(train_path, val_path)
    train_ds = ScannetReferenceDataset(
        scanrefer_train, all_scenes, split="train", augment=False,
        scannet_data_dir=paths.scannet_data, glove_path=paths.glove,
        num_points=mcfg.num_points, use_height=mcfg.use_height,
        use_color=mcfg.use_color, use_normal=mcfg.use_normal,
        use_multiview=mcfg.use_multiview, multiview_path=paths.multiview)

    model = CapNet(mcfg, num_vocabs=train_ds.num_vocabs,
                   num_vocabs_padded=int(info.get("num_vocabs_padded", 0)
                                         or 0))
    B, N = args.batch_size, mcfg.num_points
    in_dim = 3 + mcfg.input_feature_dim
    example = {
        "point_clouds": np.zeros((B, N, in_dim), np.float32),
        "lang_feat": np.zeros((B, mcfg.max_des_len + 2, mcfg.emb_size),
                              np.float32),
        # init traces the teacher-forced train path, which selects the
        # target proposal against this GT box
        "ref_box_corner_label": np.zeros((B, 8, 3), np.float32),
        "glove_emb_table": np.asarray(train_ds.emb_table),
    }
    jexample = {k: jnp.asarray(v) for k, v in example.items()}
    state = create_train_state(cfg, model, jexample, jax.random.PRNGKey(0))
    restored = CheckpointIO(os.path.join(folder, "ckpt")).restore_best_or_last(
        {"params": state.params, "batch_stats": state.batch_stats})

    # the decoder's first GRU input is lang_feat slot 0 — at eval time the
    # dataset fills it with the sos embedding (data/vocab.encode_caption),
    # so the serving artifact must too: a zero start vector shifts every
    # subsequent argmax vs scripts/eval.py on the same checkpoint
    sos_vec = jnp.asarray(
        train_ds.emb_table[int(train_ds.vocabulary["word2idx"]["sos"])],
        jnp.float32)

    def serve(point_clouds):
        lang = jnp.zeros((point_clouds.shape[0],
                          mcfg.max_des_len + 2, mcfg.emb_size), jnp.float32)
        batch = {
            "point_clouds": point_clouds,
            # serving decodes from sos only; the decoder reads slot 0
            "lang_feat": lang.at[:, 0].set(sos_vec),
            "glove_emb_table": jnp.asarray(train_ds.emb_table),
        }
        out = model.apply(restored, batch, use_tf=False, is_eval=True,
                          train=False)
        return {"tokens": out["lang_cap"].astype(jnp.int32),
                "bbox_corner": out["bbox_corner"],
                "objectness_scores": out["objectness_scores"],
                "sem_cls_scores": out["sem_cls_scores"]}

    # multi-platform lowering: the artifact runs on TPU serving fleets and
    # CPU alike regardless of where it was exported.  The Pallas FPS kernel
    # has no CPU lowering, so the portable artifact must trace the exact
    # XLA FPS form (identical indices, ~1.6x slower FPS stage) — force it
    # for the export trace only.
    from scan2cap_tpu.ops.sampling import set_fps_implementation
    set_fps_implementation("xla")
    try:
        exp = jexport.export(jax.jit(serve), platforms=("cpu", "tpu"))(
            jax.ShapeDtypeStruct((B, N, in_dim), jnp.float32))
    finally:
        set_fps_implementation("auto")
    out_path = args.out or os.path.join(folder, "model.stablehlo")
    with open(out_path, "wb") as f:
        f.write(exp.serialize())
    vocab_path = out_path + ".vocab.json"
    with open(vocab_path, "w") as f:
        json.dump({"idx2word": train_ds.vocabulary["idx2word"]}, f)
    print(f"exported {out_path} ({os.path.getsize(out_path)/1e6:.1f} MB) "
          f"+ {vocab_path}; input (B={B}, N={N}, C={in_dim}) f32")


def load_and_check(args):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    with open(args.load, "rb") as f:
        exp = jexport.deserialize(f.read())
    print(f"loaded: in {exp.in_avals} -> out {exp.out_avals}")
    if args.check:
        (spec,) = jax.tree_util.tree_leaves(exp.in_avals)
        x = jax.random.normal(jax.random.PRNGKey(0), spec.shape, spec.dtype)
        out = jax.jit(exp.call)(x)
        toks = np.asarray(out["tokens"])
        print(f"check ok: tokens {toks.shape} "
              f"boxes {np.asarray(out['bbox_corner']).shape}")


if __name__ == "__main__":
    args = parse_args()
    if args.load:
        load_and_check(args)
    else:
        assert args.folder, "--folder or --load required"
        build_and_export(args)
