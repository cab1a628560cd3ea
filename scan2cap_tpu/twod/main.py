"""Scan2Cap-2D entry point — mirror of Scan2Cap-2D/main.py:
``python -m scan2cap_tpu.twod.main --train/--eval --exp_type --viewpoint
--box --model``.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--prep", action="store_true", help="build feature DBs")
    p.add_argument("--images_root", type=str, default=None,
                   help="--prep input: <root>/<sample_id>.jpg viewpoint "
                        "renders (sample_id = scene-object_ann)")
    p.add_argument("--resnet_pth", type=str, default=None,
                   help="--prep: torchvision resnet101 .pth for the feature "
                        "extractor (offline-faithful route; see "
                        "twod/resnet.py)")
    p.add_argument("--boxes", type=str, default=None,
                   help="--prep input: json {sample_id: [{box, is_target}]}")
    p.add_argument("--train", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--exp_type", type=str, default="nonretrieval")
    p.add_argument("--viewpoint", type=str, default="annotated")
    p.add_argument("--box", type=str, default="oracle")
    p.add_argument("--model", type=str, default="snt",
                   choices=["snt", "tdbu", "retr"])
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--epoch", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tag", type=str, default="")
    return p.parse_args()


def build_model(cfg, num_vocabs):
    from scan2cap_tpu.twod.models import ShowAndTell2D, ShowAttendAndTell2D
    if cfg.model == "snt":
        feat = cfg.global_feat_size + (cfg.target_feat_size if cfg.add_target else 0)
        return ShowAndTell2D(num_vocabs=num_vocabs, feat_size=feat,
                             hidden_size=cfg.hidden_size,
                             max_desc_len=cfg.max_desc_len,
                             add_target=cfg.add_target)
    if cfg.model == "tdbu":
        return ShowAttendAndTell2D(
            num_vocabs=num_vocabs,
            feat_size=cfg.global_feat_size + cfg.target_feat_size,
            context_size=cfg.target_feat_size, hidden_size=cfg.hidden_size,
            max_desc_len=cfg.max_desc_len, add_global=cfg.add_global)
    raise ValueError(cfg.model)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from scan2cap_tpu.config import PathConfig
    from scan2cap_tpu.data.dataset import Loader
    from scan2cap_tpu.data.vocab import load_glove
    from scan2cap_tpu.losses.pretrained import compute_cap_loss_gt
    from scan2cap_tpu.twod.conf import get_config
    from scan2cap_tpu.twod.dataset import TwoDDataset

    args = parse_args()
    np.random.seed(args.seed)
    paths = PathConfig()
    cfg = get_config(args.exp_type, args.viewpoint, args.box, args.model)

    with open(os.path.join(paths.data, "ScanRefer_filtered_train.json")) as f:
        scanrefer_train = json.load(f)

    if args.prep:
        if not (args.images_root and args.boxes):
            raise SystemExit(
                "--prep requires --images_root <renders> and --boxes <json>")
        # build the (viewpoint, box-source) feature database consumed by
        # TwoDDataset (Scan2Cap-2D/preprocessing; resnet extractor with an
        # offline random-projection fallback)
        from PIL import Image
        from scan2cap_tpu.twod.dataset import sample_id_of
        from scan2cap_tpu.twod.preprocessing import build_database

        with open(os.path.join(paths.data, "ScanRefer_filtered_val.json")) as f:
            samples = scanrefer_train + json.load(f)
        with open(args.boxes) as f:
            boxes_db = json.load(f)

        def load_image(entry):
            sid = sample_id_of(entry)
            for ext in (".jpg", ".png"):
                path = os.path.join(args.images_root, sid + ext)
                if os.path.exists(path):
                    return np.asarray(Image.open(path).convert("RGB"),
                                      np.float32) / 255.0
            raise FileNotFoundError(sid)

        def load_boxes(entry):
            return boxes_db.get(sample_id_of(entry), [])

        os.makedirs(os.path.dirname(cfg.db_path) or ".", exist_ok=True)
        extractor = None
        if args.resnet_pth:
            from scan2cap_tpu.twod.preprocessing import make_resnet_extractor
            extractor = make_resnet_extractor(pth=args.resnet_pth)
        out = build_database(cfg.db_path, samples, load_image, load_boxes,
                             extractor=extractor)
        print(f"wrote {out} ({len(samples)} samples)")
        return

    glove = load_glove(paths.glove)
    train_ds = TwoDDataset(scanrefer_train, cfg, glove)
    loader = Loader(train_ds, args.batch_size, shuffle=True, seed=args.seed)

    if args.model == "retr":
        # retrieval has no training; build the memory bank and exit
        from scan2cap_tpu.twod.models import Retrieval2D
        feats, lang = {}, {}
        for i, entry in enumerate(train_ds.scanrefer):
            d = train_ds[i]
            from scan2cap_tpu.twod.dataset import sample_id_of
            sid = sample_id_of(entry)
            feats[sid] = d["t_feat"]
            lang[sid] = d["lang_ids"]
        model = Retrieval2D(feats, lang)
        print(f"retrieval bank built: {len(feats)} samples")
        return

    if args.eval:
        from scan2cap_tpu.train.checkpoints import CheckpointIO
        from scan2cap_tpu.eval.eval_helper import decode_caption, score_captions

        with open(os.path.join(paths.data, "ScanRefer_filtered_val.json")) as f:
            scanrefer_val = json.load(f)
        val_ds = TwoDDataset(scanrefer_val, cfg, glove,
                             vocab=train_ds.vocabulary)
        val_loader = Loader(val_ds, args.batch_size, shuffle=False,
                            seed=args.seed, drop_last=False)
        model = build_model(cfg, train_ds.num_vocabs)
        example = {k: jnp.asarray(v) for k, v in next(iter(val_loader)).items()}
        example["glove_emb_table"] = jnp.asarray(train_ds.emb_table)
        init = jax.jit(model.init, static_argnames=("is_eval",))
        variables = init(jax.random.PRNGKey(args.seed), example, is_eval=False)
        out_dir = os.path.join(paths.output, f"2d_{args.model}_{args.tag}")
        variables = CheckpointIO(os.path.join(out_dir, "ckpt")).restore(
            "best", dict(variables))

        @jax.jit
        def eval_step(batch):
            return model.apply(variables, batch, is_eval=True)

        corpus, candidates = {}, {}
        for d in scanrefer_val:
            key = "{}|{}|{}".format(d["scene_id"], d["object_id"],
                                    d["object_name"])
            corpus.setdefault(key, []).append(
                "sos " + " ".join(d["token"][:cfg.max_desc_len]) + " eos")
        idx2word = val_ds.vocabulary["idx2word"]
        for batch in val_loader:
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            jb["glove_emb_table"] = jnp.asarray(train_ds.emb_table)
            out = eval_step(jb)
            caps = np.asarray(out["lang_cap"])
            for b in range(caps.shape[0]):
                e = val_ds.scanrefer[int(batch["dataset_idx"][b])]
                key = "{}|{}|{}".format(e["scene_id"], e["object_id"],
                                        e["object_name"])
                candidates[key] = [decode_caption(caps[b], idx2word)]
        bleu, cider, rouge, meteor = score_captions(corpus, candidates)
        print(f"[BLEU-4] {bleu[0][3]:.4f}  [CIDEr] {cider[0]:.4f}  "
              f"[ROUGE] {rouge[0]:.4f}  [METEOR] {meteor[0]:.4f}")
        return

    if args.train:
        model = build_model(cfg, train_ds.num_vocabs)
        example = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
        init = jax.jit(model.init, static_argnames=("is_eval",))
        variables = init(jax.random.PRNGKey(args.seed), example, is_eval=False)
        tx = optax.adam(args.lr)
        opt_state = tx.init(variables["params"])

        @jax.jit
        def step(params, opt_state, batch):
            def loss_fn(p):
                out = model.apply({"params": p}, batch, is_eval=False)
                loss, acc = compute_cap_loss_gt(out)
                return loss, acc
            (loss, acc), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss, acc

        params = variables["params"]
        it = 0
        for epoch in range(args.epoch):
            for batch in loader:
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                params, opt_state, loss, acc = step(params, opt_state, jb)
                it += 1
                if it % 10 == 0:
                    print(f"[e{epoch} it{it}] loss {float(loss):.4f} "
                          f"acc {float(acc):.3f}", flush=True)
        from scan2cap_tpu.train.checkpoints import CheckpointIO
        out_dir = os.path.join(paths.output, f"2d_{args.model}_{args.tag}")
        CheckpointIO(os.path.join(out_dir, "ckpt")).save(
            "best", {"params": params})
        print(f"saved to {out_dir}")


if __name__ == "__main__":
    main()
