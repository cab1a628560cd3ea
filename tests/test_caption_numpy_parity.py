"""Decoder math parity: the Flax caption decoders vs an independent numpy
re-implementation of the reference's step equations
(caption_module.py:250-283 TopDown step; :40-75 vanilla GRU step).

The GRU cell itself is torch-verified in test_models.py; here the full
step wiring (input fusion -> GRU1 -> additive attention with -1e30 masking ->
language fusion -> GRU2 -> classifier) is replicated in numpy from the
reference equations and driven with the Flax module's own weights.
"""

import numpy as np
import jax
import jax.numpy as jnp

from scan2cap_tpu.models.caption import TopDownSceneCaptionModule, SceneCaptionModule


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _gru(p, x, h):
    gi = x @ np.asarray(p["ih"]["kernel"]) + np.asarray(p["ih"]["bias"])
    gh = h @ np.asarray(p["hh"]["kernel"]) + np.asarray(p["hh"]["bias"])
    ir, iz, inn = np.split(gi, 3, -1)
    hr, hz, hn = np.split(gh, 3, -1)
    r = _sigmoid(ir + hr)
    z = _sigmoid(iz + hz)
    n = np.tanh(inn + r * hn)
    return (1 - z) * n + z * h


def _dense(p, x):
    y = x @ np.asarray(p["kernel"])
    if "bias" in p:
        y = y + np.asarray(p["bias"])
    return y


def topdown_reference_numpy(p, word_embs, target_feat, obj_feats, valid_masks,
                            num_steps):
    """caption_module.py:250-283 + :467-480 training loop in numpy."""
    B, K, C = obj_feats.shape
    H = np.asarray(p["recurrent_cell_1"]["hh"]["kernel"]).shape[0]
    h1 = np.zeros((B, H), np.float32)
    h2 = np.zeros((B, H), np.float32)
    outs = []
    for t in range(num_steps):
        step_input = np.concatenate([word_embs[:, t], h2, target_feat], -1)
        step_input = np.maximum(_dense(p["map_topdown"], step_input), 0)
        h1 = _gru(p["recurrent_cell_1"], step_input, h1)
        combined = _dense(p["map_feat"], obj_feats) \
            + _dense(p["map_hidd"], h1)[:, None, :]
        combined = np.tanh(combined)
        scores = _dense(p["attend"], combined)          # (B, K, 1)
        scores = np.where(valid_masks[..., None] == 0, -1e30, scores)
        e = np.exp(scores - scores.max(1, keepdims=True))
        masks = e / e.sum(1, keepdims=True)
        attended = (obj_feats * masks).sum(1)
        lang = np.concatenate([attended, h1], -1)
        lang = np.maximum(_dense(p["map_lang"], lang), 0)
        h2 = _gru(p["recurrent_cell_2"], lang, h2)
        outs.append(_dense(p["classifier"], h2))
    return np.stack(outs, 1)


def test_topdown_decoder_matches_reference_equations(rng):
    B, K, C, V, T = 2, 6, 16, 12, 5
    module = TopDownSceneCaptionModule(
        num_vocabs=V, emb_size=10, feat_size=C, hidden_size=20,
        num_proposals=K, num_locals=-1, max_des_len=T, min_iou=-1.0)

    word_embs = rng.randn(B, T + 2, 10).astype(np.float32)
    obj_feats = rng.randn(B, K, C).astype(np.float32)
    valid = (rng.rand(B, K) > 0.3).astype(np.float32)
    valid[:, 0] = 1

    corners = rng.rand(B, K, 8, 3).astype(np.float32)
    d = {
        "lang_feat": jnp.asarray(word_embs),
        "bbox_feature": jnp.asarray(obj_feats),
        "bbox_mask": jnp.asarray(valid),
        "bbox_corner": jnp.asarray(corners),
        "ref_box_corner_label": jnp.asarray(corners[:, 0]),
    }
    variables = jax.jit(module.init, static_argnames=('use_tf', 'is_eval'))(jax.random.PRNGKey(0), d, use_tf=True, is_eval=False)
    out = jax.jit(module.apply, static_argnames=('use_tf', 'is_eval'))(variables, d, use_tf=True, is_eval=False)
    got = np.asarray(out["lang_cap"])                  # (B, T+1, V)

    # reference equations, target selected the same way (argmax IoU vs gt)
    from scan2cap_tpu.models.caption import select_target
    tids, _ = select_target(d)
    tids = np.asarray(tids)
    target_feat = obj_feats[np.arange(B), tids]
    want = topdown_reference_numpy(
        jax.tree.map(np.asarray, variables["params"]), word_embs,
        target_feat, obj_feats, valid, T + 1)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_vanilla_decoder_matches_reference_equations(rng):
    B, K, C, V, T = 2, 4, 16, 12, 5
    module = SceneCaptionModule(
        num_vocabs=V, emb_size=10, feat_size=C, hidden_size=20,
        num_proposals=K, max_des_len=T, min_iou=-1.0)
    word_embs = rng.randn(B, T + 2, 10).astype(np.float32)
    obj_feats = rng.randn(B, K, C).astype(np.float32)
    corners = rng.rand(B, K, 8, 3).astype(np.float32)
    d = {
        "lang_feat": jnp.asarray(word_embs),
        "bbox_feature": jnp.asarray(obj_feats),
        "bbox_corner": jnp.asarray(corners),
        "ref_box_corner_label": jnp.asarray(corners[:, 1]),
    }
    variables = jax.jit(module.init, static_argnames=('use_tf', 'is_eval'))(jax.random.PRNGKey(0), d, use_tf=True, is_eval=False)
    out = jax.jit(module.apply, static_argnames=('use_tf', 'is_eval'))(variables, d, use_tf=True, is_eval=False)
    got = np.asarray(out["lang_cap"])

    p = jax.tree.map(np.asarray, variables["params"])
    from scan2cap_tpu.models.caption import select_target
    tids, _ = select_target(d)
    # hidden init = relu(map_feat(target)) (caption_module.py:55-58,104-107)
    mapped = np.maximum(
        obj_feats @ np.asarray(p["map_feat"]["kernel"])
        + np.asarray(p["map_feat"]["bias"]), 0)
    h = mapped[np.arange(B), np.asarray(tids)]
    outs = []
    for t in range(T + 1):
        h = _gru(p["recurrent_cell"], word_embs[:, t], h)
        outs.append(_dense(p["classifier"], h))
    want = np.stack(outs, 1)
    np.testing.assert_allclose(got, want, atol=2e-4)


def topdown_eval_reference_numpy(p, emb_table, sos, obj_feats, rel, nbr,
                                 valid_masks, num_steps):
    """Eval scene decode (caption_module.py:502-592): per target, relation
    features scattered onto neighbor slots, argmax -> GloVe feedback."""
    B, K, C = obj_feats.shape
    H = np.asarray(p["recurrent_cell_1"]["hh"]["kernel"]).shape[0]
    L = nbr.shape[-1]
    tokens = np.zeros((B, K, num_steps), np.int32)
    for b in range(B):
        for t in range(K):
            feats = obj_feats[b].copy()               # (K, C)
            for l in range(L):
                feats[nbr[b, t, l]] = obj_feats[b, nbr[b, t, l]] + rel[b, t, l]
            h1 = np.zeros((H,), np.float32)
            h2 = np.zeros((H,), np.float32)
            prev = sos[b]
            for s in range(num_steps):
                x = np.concatenate([prev, h2, obj_feats[b, t]], -1)
                x = np.maximum(_dense(p["map_topdown"], x), 0)
                h1 = _gru(p["recurrent_cell_1"], x[None], h1[None])[0]
                combined = np.tanh(
                    _dense(p["map_feat"], feats)
                    + _dense(p["map_hidd"], h1)[None, :])
                scores = _dense(p["attend"], combined)[:, 0]   # (K,)
                scores = np.where(valid_masks[b, t] == 0, -1e30, scores)
                e = np.exp(scores - scores.max())
                attn = e / e.sum()
                attended = (feats * attn[:, None]).sum(0)
                lang = np.concatenate([attended, h1], -1)
                lang = np.maximum(_dense(p["map_lang"], lang), 0)
                h2 = _gru(p["recurrent_cell_2"], lang[None], h2[None])[0]
                logits = _dense(p["classifier"], h2)
                tok = int(np.argmax(logits))
                tokens[b, t, s] = tok
                prev = emb_table[tok]
    return tokens


def test_topdown_eval_scene_decode_matches_reference_equations(rng):
    # exercises the shared-projection + neighbor-correction decomposition
    B, K, C, V, T, L = 2, 6, 16, 12, 4, 2
    module = TopDownSceneCaptionModule(
        num_vocabs=V, emb_size=10, feat_size=C, hidden_size=20,
        num_proposals=K, num_locals=-1, max_des_len=T, min_iou=-1.0,
        use_relation=True, eval_chunk=4)              # kc=4 + tail chunk of 2

    word_embs = rng.randn(B, T + 2, 10).astype(np.float32)
    obj_feats = rng.randn(B, K, C).astype(np.float32)
    valid = np.ones((B, K), np.float32)
    corners = rng.rand(B, K, 8, 3).astype(np.float32)
    rel = rng.randn(B, K, L, C).astype(np.float32)
    # distinct neighbor slots per target (query_locals_dense guarantees this)
    nbr = np.stack([np.stack(
        [rng.permutation(K)[:L] for _ in range(K)]) for _ in range(B)]
    ).astype(np.int32)
    emb_table = rng.randn(V, 10).astype(np.float32)

    d = {
        "lang_feat": jnp.asarray(word_embs),
        "bbox_feature": jnp.asarray(obj_feats),
        "bbox_mask": jnp.asarray(valid),
        "bbox_corner": jnp.asarray(corners),
        "ref_box_corner_label": jnp.asarray(corners[:, 0]),
        "edge_feature": jnp.asarray(rel),
        "edge_nbr_idx": jnp.asarray(nbr),
        "glove_emb_table": jnp.asarray(emb_table),
    }
    variables = jax.jit(module.init, static_argnames=('use_tf', 'is_eval'))(jax.random.PRNGKey(0), d, use_tf=True,
                            is_eval=False)
    out = jax.jit(module.apply, static_argnames=('use_tf', 'is_eval'))(variables, d, use_tf=False, is_eval=True)
    got = np.asarray(out["lang_cap"])                 # (B, K, T-1) token ids

    want = topdown_eval_reference_numpy(
        jax.tree.map(np.asarray, variables["params"]), emb_table,
        word_embs[:, 0], obj_feats, rel, nbr, valid, T - 1)
    np.testing.assert_array_equal(got, want)


def test_topdown_eval_local_slot_decode_matches_reference_equations(rng):
    # num_locals > 0 routes through the local-slot decode (attention over the
    # L gathered local slots instead of -1e30-masking the other K-L of K);
    # the numpy reference keeps the reference's full-K masked form, with the
    # module's own valid_masks — exact token equality checks the mask <->
    # local-slot equivalence including relation corrections.
    B, K, C, V, T, L, NL = 2, 8, 16, 12, 4, 2, 3
    module = TopDownSceneCaptionModule(
        num_vocabs=V, emb_size=10, feat_size=C, hidden_size=20,
        num_proposals=K, num_locals=NL, max_des_len=T, min_iou=-1.0,
        use_relation=True)

    word_embs = rng.randn(B, T + 2, 10).astype(np.float32)
    obj_feats = rng.randn(B, K, C).astype(np.float32)
    valid = np.ones((B, K), np.float32)
    valid[1, -2:] = 0                                 # some invalid proposals
    # well-separated boxes so query_locals picks distinct neighborhoods
    centers = rng.rand(B, K, 1, 3).astype(np.float32) * 6.0
    offsets = (np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                    indexing="ij"), -1)
               .reshape(1, 1, 8, 3).astype(np.float32) * 0.2)
    corners = centers + offsets
    rel = rng.randn(B, K, L, C).astype(np.float32)
    nbr = np.stack([np.stack(
        [rng.permutation(K)[:L] for _ in range(K)]) for _ in range(B)]
    ).astype(np.int32)
    emb_table = rng.randn(V, 10).astype(np.float32)

    d = {
        "lang_feat": jnp.asarray(word_embs),
        "bbox_feature": jnp.asarray(obj_feats),
        "bbox_mask": jnp.asarray(valid),
        "bbox_corner": jnp.asarray(corners),
        "ref_box_corner_label": jnp.asarray(corners[:, 0]),
        "edge_feature": jnp.asarray(rel),
        "edge_nbr_idx": jnp.asarray(nbr),
        "glove_emb_table": jnp.asarray(emb_table),
    }
    variables = jax.jit(module.init, static_argnames=('use_tf', 'is_eval'))(jax.random.PRNGKey(0), d, use_tf=True,
                            is_eval=False)
    out = jax.jit(module.apply, static_argnames=('use_tf', 'is_eval'))(variables, d, use_tf=False, is_eval=True)
    got = np.asarray(out["lang_cap"])                 # (B, K, T-1) token ids
    local_masks = np.asarray(out["valid_masks"])      # (B, K, K)

    want = topdown_eval_reference_numpy(
        jax.tree.map(np.asarray, variables["params"]), emb_table,
        word_embs[:, 0], obj_feats, rel, nbr, local_masks, T - 1)
    np.testing.assert_array_equal(got, want)
