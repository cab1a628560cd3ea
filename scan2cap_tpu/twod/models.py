"""2D caption models — Flax rebuilds of Scan2Cap-2D/models/{snt,tdbu,retr}.py.

Decode loops are lax.scan like the 3D decoders; eval feedback uses the dense
GloVe table (data_dict["glove_emb_table"]) instead of per-step dict lookups
(snt.py:103-117 loops over the batch on CPU each step).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scan2cap_tpu.models.layers import GRUCell


class ShowAndTell2D(nn.Module):
    """GRU decoder seeded by the (global [+target]) image feature
    (snt.py:41-170)."""

    num_vocabs: int
    emb_size: int = 300
    feat_size: int = 2048
    hidden_size: int = 512
    max_desc_len: int = 30
    add_target: bool = True

    def setup(self):
        self.map_feat = nn.Dense(self.hidden_size, name="map_feat")
        self.recurrent_cell = GRUCell(self.hidden_size, name="recurrent_cell")
        self.classifier = nn.Dense(self.num_vocabs, name="classifier")

    def _decode(self, hidden0, word_embs, emb_table, num_steps, teacher_forcing):
        first = word_embs[:, 0]

        def step(carry, t):
            hidden, prev = carry
            hidden = self.recurrent_cell(prev, hidden)
            logits = self.classifier(hidden)
            if teacher_forcing:
                nxt, out = word_embs[:, t + 1], logits
            else:
                tokens = jnp.argmax(logits, -1)
                nxt, out = emb_table[tokens], tokens
            return (hidden, nxt), out

        if self.is_initializing():
            _, out0 = step((hidden0, first), jnp.asarray(0))
            return jnp.zeros((hidden0.shape[0], num_steps) + out0.shape[1:],
                             out0.dtype)
        _, outs = jax.lax.scan(step, (hidden0, first), jnp.arange(num_steps))
        return jnp.moveaxis(outs, 0, 1)

    @nn.compact
    def __call__(self, data_dict: Dict, is_eval: bool = False) -> Dict:
        d = dict(data_dict)
        feat = d["g_feat"]
        if self.add_target:
            feat = jnp.concatenate([feat, d["t_feat"]], axis=-1)
        d["inp_feat"] = feat
        hidden0 = nn.relu(self.map_feat(feat))
        T = self.max_desc_len + 1
        if not is_eval:
            d["lang_cap"] = self._decode(hidden0, d["lang_feat"], None, T, True)
        else:
            d["lang_cap"] = self._decode(
                hidden0, d["lang_feat"], d["glove_emb_table"],
                self.max_desc_len - 1, False)
        return d


class ShowAttendAndTell2D(nn.Module):
    """Top-down attention decoder over context box features
    (tdbu.py:7-260).  Step math follows TDBUCaptionBase.step:
    tanh-fused input projections feeding two GRUs with additive attention."""

    num_vocabs: int
    emb_size: int = 300
    feat_size: int = 2048 + 2052   # global + target when add_global
    context_size: int = 2052
    hidden_size: int = 512
    max_desc_len: int = 30
    add_global: bool = True

    def setup(self):
        # every projection feeding the GRUs is BIAS-FREE and 128-wide in the
        # reference (tdbu.py:29-48, bias_state=False; map_topdown/map_lang
        # are Linear(128, 128) and both GRUCells take input_size=128)
        if self.add_global:
            self.reduce_dim = nn.Dense(self.context_size, name="reduce_dim")
        self.map_topdown_1 = nn.Dense(128, use_bias=False, name="map_topdown_1")
        self.map_topdown_2 = nn.Dense(128, use_bias=False, name="map_topdown_2")
        self.map_topdown_3 = nn.Dense(128, use_bias=False, name="map_topdown_3")
        self.map_topdown = nn.Dense(128, use_bias=False, name="map_topdown")
        self.recurrent_cell_1 = GRUCell(self.hidden_size, name="recurrent_cell_1")
        self.map_feat = nn.Dense(self.hidden_size, use_bias=False, name="map_feat")
        self.map_hidd = nn.Dense(self.hidden_size, use_bias=False, name="map_hidd")
        self.attend = nn.Dense(1, use_bias=False, name="attend")
        self.map_lang_1 = nn.Dense(128, use_bias=False, name="map_lang_1")
        self.map_lang_2 = nn.Dense(128, use_bias=False, name="map_lang_2")
        self.map_lang = nn.Dense(128, use_bias=False, name="map_lang")
        self.recurrent_cell_2 = GRUCell(self.hidden_size, name="recurrent_cell_2")
        self.classifier = nn.Dense(self.num_vocabs, name="classifier")

    def _decode(self, t_feat, c_feat, word_embs, emb_table, num_steps,
                teacher_forcing):
        N = t_feat.shape[0]
        h1 = jnp.zeros((N, self.hidden_size), t_feat.dtype)
        h2 = jnp.zeros((N, self.hidden_size), t_feat.dtype)
        mapped_ctx = self.map_feat(c_feat)
        first = word_embs[:, 0]

        def step(carry, t):
            h1, h2, prev = carry
            x = jnp.tanh(self.map_topdown_3(prev) + self.map_topdown_1(h2)
                         + self.map_topdown_2(t_feat))
            x = nn.relu(self.map_topdown(x))
            h1n = self.recurrent_cell_1(x, h1)
            combined = jnp.tanh(mapped_ctx + self.map_hidd(h1n)[:, None, :])
            attn = jax.nn.softmax(self.attend(combined), axis=1)
            attended = jnp.sum(c_feat * attn, axis=1)
            lang = jnp.tanh(self.map_lang_1(attended) + self.map_lang_2(h1n))
            lang = nn.relu(self.map_lang(lang))
            h2n = self.recurrent_cell_2(lang, h2)
            logits = self.classifier(h2n)
            if teacher_forcing:
                nxt, out = word_embs[:, t + 1], logits
            else:
                tokens = jnp.argmax(logits, -1)
                nxt, out = emb_table[tokens], tokens
            return (h1n, h2n, nxt), (out, attn[..., 0])

        if self.is_initializing():
            _, (out0, attn0) = step((h1, h2, first), jnp.asarray(0))
            return (jnp.zeros((N, num_steps) + out0.shape[1:], out0.dtype),
                    jnp.zeros((N,) + attn0.shape[1:] + (num_steps,),
                              attn0.dtype))
        _, (outs, attns) = jax.lax.scan(step, (h1, h2, first),
                                        jnp.arange(num_steps))
        # attn masks stacked on the LAST axis, as the reference cats them
        # (tdbu.py:213-214: (B, num_proposals, steps) "topdown_attn")
        return jnp.moveaxis(outs, 0, 1), jnp.moveaxis(attns, 0, -1)

    @nn.compact
    def __call__(self, data_dict: Dict, is_eval: bool = False) -> Dict:
        d = dict(data_dict)
        if self.add_global:
            t_feat = jnp.concatenate([d["g_feat"], d["t_feat"]], axis=-1)
            t_feat = nn.relu(self.reduce_dim(t_feat))
        else:
            t_feat = d["t_feat"]
        d["inp_feat"] = t_feat
        c_feat = d["c_feats"]
        T = self.max_desc_len + 1
        if not is_eval:
            d["lang_cap"], d["topdown_attn"] = self._decode(
                t_feat, c_feat, d["lang_feat"], None, T, True)
        else:
            # the reference's INFERENCE path feeds the RAW t_feat, not the
            # reduced global-concat inp_feat its train path uses
            # (tdbu.py:227 vs :174; widths coincide at context_size, so
            # torch never errors) — replicated for converted-checkpoint
            # output parity
            d["lang_cap"], d["topdown_attn"] = self._decode(
                d["t_feat"], c_feat, d["lang_feat"], d["glove_emb_table"],
                self.max_desc_len - 1, False)
        return d


class Retrieval2D:
    """Cosine nearest-neighbor caption transfer (retr.py:6-48) — host side,
    no parameters: rank train-set target features, return their captions."""

    def __init__(self, train_feats: Dict[str, np.ndarray],
                 train_lang_ids: Dict[str, np.ndarray], ignore_last: int = 4):
        self.keys = list(train_feats.keys())
        self.bank = np.stack([np.asarray(train_feats[k]) for k in self.keys])
        if ignore_last:
            self.bank = self.bank[:, :-ignore_last]
        self.bank_norm = self.bank / (
            np.linalg.norm(self.bank, axis=1, keepdims=True) + 1e-12)
        self.train_lang_ids = train_lang_ids
        self.ignore_last = ignore_last

    def __call__(self, data_dict: Dict) -> list:
        feats = np.asarray(data_dict["t_feat"])
        if self.ignore_last:
            feats = feats[:, :-self.ignore_last]
        q = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-12)
        sims = q @ self.bank_norm.T                     # (B, n_train)
        best = sims.argmax(-1)
        return [self.train_lang_ids[self.keys[i]] for i in best]
