"""Full-CapNet checkpoint round-trip (VERDICT r3 item 1 + 2).

A torch-initialized FULL Scan2Cap ``model.pth`` — detection + relational
graph + top-down caption decoder, the artifact the reference's eval and
benchmark load (/root/reference/scripts/eval.py:106-108,
benchmark/predict.py:102) — must:

  * import via convert_capnet_checkpoint and drive this framework's CapNet;
  * produce eval caption TOKENS identical to the reference's step math,
    executed in torch on the flagship config's graph+caption chain
    (use_relation + num_locals + orientation head), on top of the converted
    detection outputs (the detection chain itself is torch-verified
    end-to-end in test_convert_votenet_chain.py with the same converter);
  * export back via export_capnet_checkpoint into a state_dict the torch
    model loads with strict=True and values bit-equal to the original.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import test_convert_votenet_chain as tc
from test_caption_torch_parity import build_torch_topdown, topdown_step_t
from test_graph_torch_parity import build_torch_graph, edge_conv_forward_t

from scan2cap_tpu.config import ModelConfig
from scan2cap_tpu.convert import (
    _merge,
    convert_capnet_checkpoint,
    export_capnet_checkpoint,
)
from scan2cap_tpu.models import CapNet
from scan2cap_tpu.models.caption import query_locals_for_targets

B, N, K = 2, 512, 32
L, EMB, HID, VOCAB, MAX_LEN, FEAT, NUM_BINS = 4, 12, 24, 40, 6, 128, 6


def _build_full_torch_model(in_feat):
    model = tc.build_torch_votenet(in_feat)
    model.add_module(
        "graph",
        build_torch_graph(num_layers=2, orientation=True,
                          c=FEAT, num_bins=NUM_BINS).graph)
    model.add_module(
        "caption",
        build_torch_topdown(feat=FEAT, emb=EMB, hid=HID, vocab=VOCAB).caption)
    return model


def test_full_capnet_roundtrip(tmp_path):
    cfg = ModelConfig(
        num_points=N, num_proposals=K, sa_npoints=tc.SA_NPOINTS,
        no_caption=False, use_topdown=True, num_graph_steps=2,
        num_locals=L, use_relation=True, use_orientation=True,
        emb_size=EMB, hidden_size=HID, max_des_len=MAX_LEN,
        use_normal=True, use_multiview=True)
    in_feat = cfg.input_feature_dim

    rng = np.random.RandomState(17)
    pc = np.concatenate([
        rng.uniform(-2, 2, (B, N, 3)),
        rng.randn(B, N, in_feat) * 0.1], -1).astype(np.float32)
    lang_feat = rng.randn(B, MAX_LEN + 2, EMB).astype(np.float32) * 0.5
    emb_table = rng.randn(VOCAB, EMB).astype(np.float32) * 0.5

    tmodel = _build_full_torch_model(in_feat)
    tc._randomize(tmodel)
    tmodel.eval()
    path = tmp_path / "model.pth"
    torch.save(tmodel.state_dict(), str(path))

    # ---- import + flax forward (eval mode: all-proposals decode) ----
    model = CapNet(cfg, num_vocabs=VOCAB)
    batch = {"point_clouds": jnp.asarray(pc),
             "lang_feat": jnp.asarray(lang_feat),
             "glove_emb_table": jnp.asarray(emb_table)}
    variables = jax.jit(model.init,
                        static_argnames=("use_tf", "is_eval", "train"))(
        jax.random.PRNGKey(0), batch, use_tf=False, is_eval=True, train=False)
    cparams, cstats = convert_capnet_checkpoint(str(path))
    params = _merge(variables["params"], cparams)
    stats = _merge(variables["batch_stats"], cstats)
    d = jax.jit(model.apply,
                static_argnames=("use_tf", "is_eval", "train"))(
        {"params": params, "batch_stats": stats}, batch,
        use_tf=False, is_eval=True, train=False)

    corners = np.asarray(d["bbox_corner"])
    obj_mask = np.asarray(d["bbox_mask"]).astype(np.float32)
    pre_graph = np.asarray(d["aggregated_vote_features"])
    nbr = np.asarray(d["edge_nbr_idx"])
    emask = np.asarray(d["edge_mask"])
    assert obj_mask.sum(axis=1).min() > L, "need enough valid proposals"

    # ---- torch graph chain on the converted detection features ----
    node_feats = np.zeros_like(pre_graph)
    messages = np.zeros((B, K, L, FEAT), np.float32)
    with torch.no_grad():
        for b in range(B):
            x = torch.from_numpy(pre_graph[b])
            nbr_t = torch.from_numpy(nbr[b])
            mask_t = torch.from_numpy(emask[b])
            feat = x
            for layer in tmodel.graph.gc_layers:
                feat, msg = edge_conv_forward_t(layer, feat, nbr_t, mask_t)
            node_feats[b] = ((x + feat)
                             * torch.from_numpy(obj_mask[b])[:, None]).numpy()
            messages[b] = msg.numpy()

    np.testing.assert_allclose(np.asarray(d["bbox_feature"]), node_feats,
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d["edge_feature"]), messages,
                               atol=1e-3, rtol=1e-3)

    # ---- torch caption eval decode (reference loop: per-proposal target,
    # local masks, relation scatter — caption_module.py:522-585) ----
    got_tokens = np.asarray(d["lang_cap"])            # (B, K, MAX_LEN-1)
    cap = tmodel.caption
    want_tokens = np.zeros_like(got_tokens)
    with torch.no_grad():
        of = torch.from_numpy(node_feats)
        tab = torch.from_numpy(emb_table)
        for k in range(K):
            masks_k = np.asarray(query_locals_for_targets(
                jnp.asarray(corners), jnp.asarray(obj_mask),
                jnp.full((B,), k, jnp.int32), L, cfg.query_mode, 0.5))
            m = torch.from_numpy(masks_k)
            # relation: scatter the target's edge features onto its
            # neighbor proposals (caption_module.py:394-414)
            prop_obj = of.clone()
            for b in range(B):
                prop_obj[b, nbr[b, k]] = (of[b, nbr[b, k]]
                                          + torch.from_numpy(messages[b, k]))
            tgt = of[:, k]
            h1 = torch.zeros(B, HID)
            h2 = torch.zeros(B, HID)
            step_input = torch.from_numpy(lang_feat[:, 0])
            for t in range(MAX_LEN - 1):
                h1, h2, _ = topdown_step_t(
                    cap, step_input, tgt, prop_obj, h1, h2, m)
                tok = cap.classifier(h2).argmax(-1)
                want_tokens[:, k, t] = tok.numpy()
                step_input = tab[tok]

    np.testing.assert_array_equal(got_tokens, want_tokens)

    # ---- export: the reference must be able to strict-load our model.pth ----
    sd_out = export_capnet_checkpoint(params, stats)
    missing, unexpected = tmodel.load_state_dict(sd_out, strict=True)
    assert not missing and not unexpected
    for key, val in tmodel.state_dict().items():
        if key.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(
            sd_out[key].numpy(), val.numpy(), atol=1e-6, rtol=1e-6,
            err_msg=key)
