"""Scan2Cap-2D sub-project tests: models, dataset, retrieval, preprocessing."""

import numpy as np
import h5py
import jax
import jax.numpy as jnp

from scan2cap_tpu.data.synthetic import make_vocab
from scan2cap_tpu.twod.conf import get_config, TwoDConfig
from scan2cap_tpu.twod.models import (
    ShowAndTell2D, ShowAttendAndTell2D, Retrieval2D)


def _lang(rng, vocab, B, T=32):
    table = vocab["emb_table"]
    ids = np.zeros((B, T), np.int32)
    feat = np.zeros((B, T, 300), np.float32)
    lens = np.zeros((B,), np.int32)
    for b in range(B):
        k = rng.randint(3, 8)
        seq = [2] + list(rng.randint(4, len(table), k)) + [3]
        ids[b, :len(seq)] = seq
        feat[b, :len(seq)] = table[seq]
        lens[b] = len(seq)
    return feat, ids, lens


def test_show_and_tell(rng):
    vocab = make_vocab(num_vocabs=32)
    B = 2
    feat, ids, lens = _lang(rng, vocab, B)
    batch = {
        "g_feat": jnp.asarray(rng.randn(B, 64).astype(np.float32)),
        "t_feat": jnp.asarray(rng.randn(B, 68).astype(np.float32)),
        "lang_feat": jnp.asarray(feat),
        "lang_ids": jnp.asarray(ids),
        "lang_len": jnp.asarray(lens),
        "glove_emb_table": jnp.asarray(vocab["emb_table"]),
    }
    model = ShowAndTell2D(num_vocabs=32, feat_size=64 + 68, hidden_size=96,
                          max_desc_len=30)
    variables = jax.jit(model.init, static_argnames=("is_eval",))(
        jax.random.PRNGKey(0), batch, is_eval=False)
    out = jax.jit(model.apply, static_argnames=('is_eval',))(variables, batch, is_eval=False)
    assert out["lang_cap"].shape == (B, 31, 32)
    out_e = jax.jit(model.apply, static_argnames=('is_eval',))(variables, batch, is_eval=True)
    assert out_e["lang_cap"].shape == (B, 29)  # token ids

    # trainable: loss decreases on a fixed batch
    import optax
    from scan2cap_tpu.losses.pretrained import compute_cap_loss_gt
    tx = optax.adam(1e-2)
    opt = tx.init(variables["params"])

    @jax.jit
    def step(p, opt):
        def loss_fn(p):
            o = model.apply({"params": p}, batch, is_eval=False)
            return compute_cap_loss_gt(o)[0]
        loss, g = jax.value_and_grad(loss_fn)(p)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(p, u), opt, loss

    p = variables["params"]
    losses = []
    for _ in range(30):
        p, opt, loss = step(p, opt)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]


def test_show_attend_and_tell(rng):
    vocab = make_vocab(num_vocabs=32)
    B, P = 2, 5
    feat, ids, lens = _lang(rng, vocab, B)
    batch = {
        "g_feat": jnp.asarray(rng.randn(B, 64).astype(np.float32)),
        "t_feat": jnp.asarray(rng.randn(B, 68).astype(np.float32)),
        "c_feats": jnp.asarray(rng.randn(B, P, 68).astype(np.float32)),
        "lang_feat": jnp.asarray(feat),
        "lang_ids": jnp.asarray(ids),
        "lang_len": jnp.asarray(lens),
        "glove_emb_table": jnp.asarray(vocab["emb_table"]),
    }
    model = ShowAttendAndTell2D(num_vocabs=32, feat_size=64 + 68,
                                context_size=68, hidden_size=96)
    variables = jax.jit(model.init, static_argnames=("is_eval",))(
        jax.random.PRNGKey(0), batch, is_eval=False)
    out = jax.jit(model.apply, static_argnames=('is_eval',))(variables, batch, is_eval=False)
    assert out["lang_cap"].shape == (B, 31, 32)
    out_e = jax.jit(model.apply, static_argnames=('is_eval',))(variables, batch, is_eval=True)
    assert out_e["lang_cap"].shape == (B, 29)


def test_retrieval(rng):
    feats = {f"s{i}": rng.randn(68).astype(np.float32) for i in range(10)}
    lang = {f"s{i}": np.full(5, i) for i in range(10)}
    retr = Retrieval2D(feats, lang, ignore_last=4)
    # query = exact copy of s3's features -> retrieves s3's caption
    q = {"t_feat": np.stack([feats["s3"], feats["s7"]])}
    out = retr(q)
    np.testing.assert_array_equal(out[0], lang["s3"])
    np.testing.assert_array_equal(out[1], lang["s7"])


def test_twod_dataset_and_preprocessing(tmp_path, rng):
    from scan2cap_tpu.twod.dataset import TwoDDataset, sample_id_of
    from scan2cap_tpu.twod.preprocessing import build_database
    from tests.test_dataset import make_fixture_glove

    entries = [{"scene_id": "scene0000_00", "object_id": str(o),
                "ann_id": "0", "object_name": "chair",
                "token": ["a", "chair"]} for o in range(3)]
    glove = make_fixture_glove(["a", "chair"])

    def load_image(entry):
        return rng.rand(240, 320, 3).astype(np.float32)

    def load_boxes(entry):
        return [{"box": (10, 10, 100, 100), "is_target": True},
                {"box": (50, 50, 150, 150), "is_target": False}]

    db_path = str(tmp_path / "feats.hdf5")
    build_database(db_path, entries, load_image, load_boxes)

    cfg = get_config("nonretrieval", "annotated", "oracle", "snt")
    ds = TwoDDataset(entries, cfg, glove, db_path=db_path)
    d = ds[0]
    assert d["g_feat"].shape == (2048,)
    assert d["t_feat"].shape == (2052,)
    assert d["c_feats"].shape == (cfg.num_proposals, 2052)
    assert d["c_mask"].sum() == 1
    assert d["lang_ids"][0] == 2  # sos
    assert sample_id_of(entries[0]) == "scene0000_00-0_0"


def test_tdbu_step_matches_torch(rng):
    # one decode step of ShowAttendAndTell2D vs a torch build of the
    # reference step equations (Scan2Cap-2D/models/tdbu.py:55-103:
    # bias-free 128-wide fused projections, two GRUCells, additive
    # attention over the context features)
    import torch
    import jax
    import jax.numpy as jnp
    from scan2cap_tpu.twod.models import ShowAttendAndTell2D

    B, P, V, E, C, H = 3, 5, 20, 16, 24, 32
    model = ShowAttendAndTell2D(num_vocabs=V, emb_size=E, feat_size=48,
                                context_size=C, hidden_size=H,
                                max_desc_len=4, add_global=False)
    d = {
        "t_feat": jnp.asarray(rng.randn(B, C).astype(np.float32)),
        "c_feats": jnp.asarray(rng.randn(B, P, C).astype(np.float32)),
        "lang_feat": jnp.asarray(rng.randn(B, 5, E).astype(np.float32)),
        "lang_len": jnp.full((B,), 5, jnp.int32),
    }
    variables = jax.jit(model.init, static_argnames=('is_eval',))(jax.random.PRNGKey(0), d, is_eval=False)
    out = jax.jit(model.apply, static_argnames=('is_eval',))(variables, d, is_eval=False)
    got_logits = np.asarray(out["lang_cap"])[:, 0]      # first step
    got_attn = np.asarray(out["topdown_attn"])[:, :, 0]

    p = variables["params"]

    def lin(name):
        w = torch.tensor(np.asarray(p[name]["kernel"]).T)
        m = torch.nn.Linear(w.shape[1], w.shape[0], bias="bias" in p[name])
        with torch.no_grad():
            m.weight.copy_(w)
            if "bias" in p[name]:
                m.bias.copy_(torch.tensor(np.asarray(p[name]["bias"])))
        return m

    def gru(name, in_size):
        g = torch.nn.GRUCell(in_size, H)
        with torch.no_grad():
            g.weight_ih.copy_(torch.tensor(np.asarray(p[name]["ih"]["kernel"]).T))
            g.weight_hh.copy_(torch.tensor(np.asarray(p[name]["hh"]["kernel"]).T))
            g.bias_ih.copy_(torch.tensor(np.asarray(p[name]["ih"]["bias"])))
            g.bias_hh.copy_(torch.tensor(np.asarray(p[name]["hh"]["bias"])))
        return g

    t_feat = torch.tensor(np.asarray(d["t_feat"]))
    c_feats = torch.tensor(np.asarray(d["c_feats"]))
    word0 = torch.tensor(np.asarray(d["lang_feat"]))[:, 0]
    h1 = torch.zeros(B, H)
    h2 = torch.zeros(B, H)
    with torch.no_grad():
        x = torch.tanh(lin("map_topdown_3")(word0)
                       + lin("map_topdown_1")(h2)
                       + lin("map_topdown_2")(t_feat))
        x = torch.relu(lin("map_topdown")(x))
        h1 = gru("recurrent_cell_1", 128)(x, h1)
        combined = torch.tanh(lin("map_feat")(c_feats)
                              + lin("map_hidd")(h1).unsqueeze(1))
        masks = torch.softmax(lin("attend")(combined), dim=1)
        attended = (c_feats * masks).sum(1)
        lang = torch.tanh(lin("map_lang_1")(attended)
                          + lin("map_lang_2")(h1))
        lang = torch.relu(lin("map_lang")(lang))
        h2 = gru("recurrent_cell_2", 128)(lang, h2)
        want_logits = lin("classifier")(h2).numpy()
        want_attn = masks[..., 0].numpy()

    np.testing.assert_allclose(got_logits, want_logits, atol=2e-5)
    np.testing.assert_allclose(got_attn, want_attn, atol=2e-6)
