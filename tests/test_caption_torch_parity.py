"""Torch-golden caption-module parity (VERDICT r3 items 2-3).

test_caption_numpy_parity.py checks the Flax decoders against a numpy
re-implementation of the reference equations; here the reference's actual
step math — the top-down 2-GRU attention step of
/root/reference/models/caption_module.py:252-296 and the plain GRU decoder
of caption_module.py:40-68 — is EXECUTED IN TORCH with weights round-tripped
through convert.convert_caption_module / export_capnet_checkpoint, so both
the converter mapping and the Flax scan decoders are verified against
runnable reference semantics:

  * teacher-forcing train decode: logits parity at <=1e-4;
  * eval scene decode (greedy argmax over all proposals): TOKEN equality,
    both with full-proposal attention (num_locals=-1) and with the
    local-slot decode (num_locals=L, whose -1e30 masking the reference
    applies at caption_module.py:275-283).

Target selection / local-mask construction are shared inputs (their own
reference parity is covered by test_caption_numpy_parity.py), isolating the
weight layout and the recurrent/attention math.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from scan2cap_tpu.convert import (
    _merge,
    convert_caption_module,
    export_capnet_checkpoint,
)
from scan2cap_tpu.models.caption import (
    SceneCaptionModule,
    TopDownSceneCaptionModule,
    query_locals_for_targets,
)

B, K, L = 2, 10, 4
FEAT, EMB, HID, VOCAB = 16, 12, 24, 40
MAX_LEN = 6  # max_des_len; train decodes MAX_LEN+1 steps, eval MAX_LEN-1


def _named(**children):
    m = tnn.Module()
    for k, v in children.items():
        m.add_module(k, v)
    return m


def build_torch_topdown(feat=FEAT, emb=EMB, hid=HID, vocab=VOCAB):
    cap = _named(
        map_topdown=tnn.Sequential(
            tnn.Linear(hid + feat + emb, emb), tnn.ReLU()),
        recurrent_cell_1=tnn.GRUCell(emb, hid),
        map_feat=tnn.Linear(feat, hid, bias=False),
        map_hidd=tnn.Linear(hid, hid, bias=False),
        attend=tnn.Linear(hid, 1, bias=False),
        map_lang=tnn.Sequential(
            tnn.Linear(feat + hid, emb), tnn.ReLU()),
        recurrent_cell_2=tnn.GRUCell(emb, hid),
        classifier=tnn.Linear(hid, vocab),
    )
    return _named(caption=cap)


def build_torch_scene():
    cap = _named(
        map_feat=tnn.Sequential(tnn.Linear(FEAT, EMB), tnn.ReLU()),
        recurrent_cell=tnn.GRUCell(EMB, EMB),
        classifier=tnn.Linear(EMB, VOCAB),
    )
    return _named(caption=cap)


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g) * 0.3
    model.load_state_dict(sd)


def _sd_numpy(model):
    return {k: v.numpy() for k, v in model.state_dict().items()}


def topdown_step_t(cap, step_input, target_feat, obj_feats, h1, h2, masks):
    """The reference's _step (caption_module.py:252-296), verbatim math."""
    x = torch.cat([step_input, h2, target_feat], dim=-1)
    x = cap.map_topdown(x)
    h1 = cap.recurrent_cell_1(x, h1)
    combined = cap.map_feat(obj_feats) + cap.map_hidd(h1).unsqueeze(1)
    scores = cap.attend(torch.tanh(combined))          # (B, K, 1)
    scores = scores.masked_fill(masks.unsqueeze(-1) == 0, float(-1e30))
    attn = F.softmax(scores, dim=1)
    attended = (obj_feats * attn).sum(1)
    lang_in = cap.map_lang(torch.cat([attended, h1], dim=-1))
    h2 = cap.recurrent_cell_2(lang_in, h2)
    return h1, h2, attn


def _inputs(seed=3):
    rng = np.random.RandomState(seed)
    obj_feats = rng.randn(B, K, FEAT).astype(np.float32) * 0.5
    masks = np.ones((B, K), np.float32)
    masks[:, -2:] = 0.0
    # boxes only drive local-mask construction; spread them out
    centers = rng.uniform(-6, 6, (B, K, 3)).astype(np.float32)
    sizes = rng.uniform(0.3, 0.8, (B, K, 3)).astype(np.float32)
    signs = np.array([[1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
                      [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1]],
                     np.float32)
    corners = centers[:, :, None, :] + signs[None, None] * sizes[:, :, None, :] / 2
    word_embs = rng.randn(B, MAX_LEN + 2, EMB).astype(np.float32) * 0.5
    emb_table = rng.randn(VOCAB, EMB).astype(np.float32) * 0.5
    target_ids = np.array([1, 4], np.int64)
    return obj_feats, masks, corners, word_embs, emb_table, target_ids


@pytest.fixture(scope="module")
def topdown_pair():
    tmodel = build_torch_topdown()
    _randomize(tmodel)
    tmodel.eval()
    converted: dict = {}
    variant = convert_caption_module(_sd_numpy(tmodel), converted)
    assert variant == "topdown"
    return tmodel, converted["caption"]


def _flax_topdown(num_locals):
    return TopDownSceneCaptionModule(
        num_vocabs=VOCAB, emb_size=EMB, feat_size=FEAT, hidden_size=HID,
        num_proposals=K, num_locals=num_locals, query_mode="center",
        use_relation=False, use_oracle=True, max_des_len=MAX_LEN)


def test_topdown_teacher_forcing_logits(topdown_pair):
    tmodel, cparams = topdown_pair
    obj_feats, masks, corners, word_embs, _, target_ids = _inputs()

    model = _flax_topdown(num_locals=-1)
    data = {
        "bbox_feature": jnp.asarray(obj_feats),
        "bbox_mask": jnp.asarray(masks),
        "bbox_corner": jnp.asarray(corners),
        "bbox_idx": jnp.asarray(target_ids),
        "lang_feat": jnp.asarray(word_embs),
    }
    variables = model.init(jax.random.PRNGKey(0), data,
                           use_tf=True, is_eval=False)
    params = _merge(variables["params"], cparams)
    d = model.apply({"params": params}, data, use_tf=True, is_eval=False)
    got = np.asarray(d["lang_cap"])                    # (B, T-1, VOCAB)

    cap = tmodel.caption
    with torch.no_grad():
        of = torch.from_numpy(obj_feats)
        m = torch.from_numpy(masks)
        tf_feat = of[torch.arange(B), torch.from_numpy(target_ids)]
        h1 = torch.zeros(B, HID)
        h2 = torch.zeros(B, HID)
        step_input = torch.from_numpy(word_embs[:, 0])
        outs = []
        T = MAX_LEN + 2
        for t in range(T - 1):
            h1, h2, _ = topdown_step_t(cap, step_input, tf_feat, of, h1, h2, m)
            outs.append(cap.classifier(h2))
            step_input = torch.from_numpy(word_embs[:, t + 1])
        want = torch.stack(outs, dim=1).numpy()

    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def _torch_eval_tokens(cap, obj_feats, attn_masks, emb_table, sos):
    """Greedy all-proposals eval decode (caption_module.py:529-585): each
    proposal is the target in turn; attn_masks (B, K_target, K) gives the
    attention validity mask used for that target's decode."""
    tokens = np.zeros((B, K, MAX_LEN - 1), np.int64)
    with torch.no_grad():
        of = torch.from_numpy(obj_feats)
        tab = torch.from_numpy(emb_table)
        for k in range(K):
            m = torch.from_numpy(attn_masks[:, k])
            tf_feat = of[:, k]
            h1 = torch.zeros(B, HID)
            h2 = torch.zeros(B, HID)
            step_input = torch.from_numpy(sos)
            for t in range(MAX_LEN - 1):
                h1, h2, _ = topdown_step_t(
                    cap, step_input, tf_feat, of, h1, h2, m)
                tok = cap.classifier(h2).argmax(-1)
                tokens[:, k, t] = tok.numpy()
                step_input = tab[tok]
    return tokens


def test_topdown_eval_tokens_full_attention(topdown_pair):
    tmodel, cparams = topdown_pair
    obj_feats, masks, corners, word_embs, emb_table, target_ids = _inputs()

    model = _flax_topdown(num_locals=-1)
    data = {
        "bbox_feature": jnp.asarray(obj_feats),
        "bbox_mask": jnp.asarray(masks),
        "bbox_corner": jnp.asarray(corners),
        "bbox_idx": jnp.asarray(target_ids),
        "lang_feat": jnp.asarray(word_embs),
        "glove_emb_table": jnp.asarray(emb_table),
    }
    variables = model.init(jax.random.PRNGKey(0), data,
                           use_tf=False, is_eval=True)
    params = _merge(variables["params"], cparams)
    d = model.apply({"params": params}, data, use_tf=False, is_eval=True)
    got = np.asarray(d["lang_cap"])                    # (B, K, T_dec) tokens

    attn_masks = np.broadcast_to(masks[:, None, :], (B, K, K))
    want = _torch_eval_tokens(
        tmodel.caption, obj_feats, attn_masks, emb_table, word_embs[:, 0])
    np.testing.assert_array_equal(got, want)


def test_topdown_eval_tokens_local_slots(topdown_pair):
    """The local-slot decode must emit the same greedy tokens as the
    reference's full-K masked attention (-1e30 underflows to exactly 0)."""
    tmodel, cparams = topdown_pair
    obj_feats, masks, corners, word_embs, emb_table, target_ids = _inputs()

    model = _flax_topdown(num_locals=L)
    data = {
        "bbox_feature": jnp.asarray(obj_feats),
        "bbox_mask": jnp.asarray(masks),
        "bbox_corner": jnp.asarray(corners),
        "bbox_idx": jnp.asarray(target_ids),
        "lang_feat": jnp.asarray(word_embs),
        "glove_emb_table": jnp.asarray(emb_table),
    }
    variables = model.init(jax.random.PRNGKey(0), data,
                           use_tf=False, is_eval=True)
    params = _merge(variables["params"], cparams)
    d = model.apply({"params": params}, data, use_tf=False, is_eval=True)
    got = np.asarray(d["lang_cap"])

    # per-target local masks, same construction the reference applies per
    # target (caption_module.py:322-363 via _query_locals, include_self)
    attn_masks = np.stack([
        np.asarray(query_locals_for_targets(
            jnp.asarray(corners), jnp.asarray(masks),
            jnp.full((B,), k, jnp.int32), L, "center", 0.5))
        for k in range(K)], axis=1)                    # (B, K_target, K)
    want = _torch_eval_tokens(
        tmodel.caption, obj_feats, attn_masks, emb_table, word_embs[:, 0])
    np.testing.assert_array_equal(got, want)


def test_scene_module_teacher_forcing_logits():
    tmodel = build_torch_scene()
    _randomize(tmodel, seed=5)
    tmodel.eval()
    converted: dict = {}
    variant = convert_caption_module(_sd_numpy(tmodel), converted)
    assert variant == "scene"

    obj_feats, masks, corners, word_embs, _, target_ids = _inputs(9)
    model = SceneCaptionModule(
        num_vocabs=VOCAB, emb_size=EMB, feat_size=FEAT,
        num_proposals=K, max_des_len=MAX_LEN)
    # SceneCaptionModule always argmax-IoU-selects its target
    # (caption_module.py:96-101); a GT box identical to the wanted
    # proposal's box makes that selection deterministic.
    gt_boxes = corners[np.arange(B), target_ids]
    data = {
        "bbox_feature": jnp.asarray(obj_feats),
        "bbox_mask": jnp.asarray(masks),
        "bbox_corner": jnp.asarray(corners),
        "ref_box_corner_label": jnp.asarray(gt_boxes),
        "lang_feat": jnp.asarray(word_embs),
    }
    variables = model.init(jax.random.PRNGKey(0), data,
                           use_tf=True, is_eval=False)
    params = _merge(variables["params"], converted["caption"])
    d = model.apply({"params": params}, data, use_tf=True, is_eval=False)
    got = np.asarray(d["lang_cap"])

    cap = tmodel.caption
    with torch.no_grad():
        of = torch.from_numpy(obj_feats)
        tf_feat = of[torch.arange(B), torch.from_numpy(target_ids)]
        # SceneCaptionModule: hidden starts as map_feat(target)
        # (caption_module.py:55-67,96-108)
        hidden = cap.map_feat(tf_feat)
        step_input = torch.from_numpy(word_embs[:, 0])
        outs = []
        T = MAX_LEN + 2
        for t in range(T - 1):
            hidden = cap.recurrent_cell(step_input, hidden)
            outs.append(cap.classifier(hidden))
            step_input = torch.from_numpy(word_embs[:, t + 1])
        want = torch.stack(outs, dim=1).numpy()

    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_caption_export_roundtrip():
    """export_capnet_checkpoint emits the reference caption key layout and
    round-trips bit-exactly through convert_caption_module."""
    tmodel = build_torch_topdown()
    _randomize(tmodel, seed=13)
    converted: dict = {}
    convert_caption_module(_sd_numpy(tmodel), converted)

    sd = export_capnet_checkpoint(converted, {})
    expect = {
        "caption.map_topdown.0.weight", "caption.map_topdown.0.bias",
        "caption.recurrent_cell_1.weight_ih", "caption.recurrent_cell_1.bias_hh",
        "caption.map_feat.weight", "caption.map_hidd.weight",
        "caption.attend.weight", "caption.map_lang.0.weight",
        "caption.recurrent_cell_2.weight_hh", "caption.classifier.bias",
    }
    assert expect <= set(sd.keys())
    for k, v in _sd_numpy(tmodel).items():
        np.testing.assert_array_equal(sd[k].numpy(), v)
