"""Caption decoders — TPU rebuild of models/caption_module.py.

* ``select_target`` (caption_module.py:16-38): per-sample argmax-IoU proposal
  vs the GT ref box — vectorized, no Python loop.
* ``SceneCaptionModule`` (:40-200): vanilla GRU decoder.
* ``TopDownSceneCaptionModule`` (:202-592): 2-layer attention decoder.

Decode loops become ``lax.scan``:
  train: one teacher-forced scan of MAX_DES_LEN+1 steps (the reference runs
    max(lang_len)-1 dynamic steps, caption_module.py:467-480 — here the extra
    steps are masked in the loss, same objective);
  eval: the reference loops over 256 proposals × 29 steps in Python with a
    per-step argmax → GloVe dict lookup on CPU (:529-585); here the proposal
    axis folds into the batch and the feedback embedding is one gather from a
    device-resident (vocab, 300) GloVe table — data_dict["glove_emb_table"].

The attention projection of object features (map_feat) is hoisted out of the
step loop — it does not depend on the hidden state (the reference recomputes
it every step, caption_module.py:275-283; same math).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scan2cap_tpu.models.layers import GRUCell
from scan2cap_tpu.models.graph import (query_locals_dense, bbox_centers,
                                       mask_and_topk_locals)
from scan2cap_tpu.ops.boxes import box3d_iou_batch, box3d_iou_matrix


def select_target(data_dict: dict) -> Tuple[jax.Array, jax.Array]:
    """Argmax-IoU proposal per sample vs GT ref box (caption_module.py:16-38).

    Returns (target_ids (B,), target_ious (B,))."""
    pred_bbox = data_dict["bbox_corner"]        # (B, K, 8, 3)
    gt_bbox = data_dict["ref_box_corner_label"]  # (B, 8, 3)
    ious = box3d_iou_batch(pred_bbox, gt_bbox[:, None])  # (B, K)
    target_ids = jnp.argmax(ious, axis=1).astype(jnp.int32)
    target_ious = jnp.take_along_axis(ious, target_ids[:, None], axis=1)[:, 0]
    return target_ids, target_ious


def query_locals_for_targets(
    corners: jax.Array,          # (B, K, 8, 3)
    object_masks: jax.Array,     # (B, K)
    target_ids: jax.Array,       # (B,)
    num_locals: int,
    query_mode: str = "center",
    overlay_threshold: float = 0.5,
) -> jax.Array:
    """_query_locals for one target per sample, include_self=True
    (caption_module.py:322-363). Returns (B, K) 0/1 local masks."""
    B, K = object_masks.shape
    centers = bbox_centers(corners)
    t_centers = jnp.take_along_axis(centers, target_ids[:, None, None], axis=1)
    t_corners = jnp.take_along_axis(
        corners, target_ids[:, None, None, None], axis=1)  # (B,1,8,3)

    if query_mode == "center":
        dist = jnp.sqrt(jnp.sum((t_centers - centers) ** 2, axis=-1) + 1e-8)
    elif query_mode == "corner":
        diff = t_corners[:, 0, :, None, :] - centers[:, None, :, :]
        dist = jnp.min(jnp.sqrt(jnp.sum(diff ** 2, axis=-1) + 1e-8), axis=1)
    else:
        raise ValueError(f"invalid query_mode {query_mode}")

    iou = box3d_iou_batch(jnp.broadcast_to(t_corners, corners.shape), corners)
    topk = mask_and_topk_locals(
        dist, object_masks == 0, iou, jax.nn.one_hot(target_ids, K, dtype=bool),
        num_locals, overlay_threshold)
    masks = jnp.zeros((B, K), jnp.float32)
    return masks.at[jnp.arange(B)[:, None], topk].set(1.0)


def add_relation_feat(data_dict: dict, obj_feats: jax.Array,
                      target_ids: jax.Array) -> jax.Array:
    """Scatter the target's edge features onto its neighbor proposals and add
    (caption_module.py:394-414).  obj_feats (B, K, C), target_ids (B,)."""
    B, K, C = obj_feats.shape
    rel_feats = jnp.take_along_axis(
        data_dict["edge_feature"], target_ids[:, None, None, None], axis=1
    )[:, 0]                                                   # (B, L, C)
    nbr = jnp.take_along_axis(
        data_dict["edge_nbr_idx"], target_ids[:, None, None], axis=1
    )[:, 0]                                                   # (B, L)
    scattered = jnp.zeros_like(obj_feats)
    scattered = scattered.at[jnp.arange(B)[:, None], nbr].set(rel_feats)
    return obj_feats + scattered


def _gather_targets(x: jax.Array, target_ids: jax.Array) -> jax.Array:
    """x (B, K, C), ids (B,) -> (B, C)."""
    return jnp.take_along_axis(x, target_ids[:, None, None], axis=1)[:, 0]


def _mask_pad_logits(logits: jax.Array, num_vocabs: int) -> jax.Array:
    """Mask classifier columns past the real vocabulary with -1e30.

    When the classifier is padded to a TP-friendly width (``padded_vocab``,
    TPU_DESIGN §12: an output dim divisible by the mesh's "model" axis lets
    XLA vocab-shard the projection instead of falling back to hidden-sharded
    psums that scale with the batch), the pad columns must never influence
    results.  -1e30 guarantees that: argmax never selects a pad id (real
    logits are finitely small), and exp(-1e30 - max) underflows to exactly
    0.0 in f32, so the pad columns contribute nothing to softmax/logsumexp.
    The only remaining delta vs the unpadded model is f32 reassociation of
    the WIDENED classifier matmul itself (the backend may tile an N=3456
    gemm differently from N=3433 — last-ulp on CPU; the MXU's fixed
    K-accumulation order makes same-inputs runs deterministic either way).
    Masking (vs slicing) keeps the vocab axis at
    its sharded width — a slice to 3433 of a 3456-wide vocab-sharded tensor
    would force an all-gather of the very logits the padding de-shards."""
    if logits.shape[-1] == num_vocabs:
        return logits
    return logits.at[..., num_vocabs:].set(-1e30)


def _shard_targets(x: jax.Array) -> jax.Array:
    """Proposal-axis (tensor) parallelism hook for the eval decode: when an
    ambient mesh (jax.set_mesh) has a "model" axis, constrain the target-
    chunk axis (dim 1 of (B, kc, ...)) onto it so each device decodes its
    slice of the 256 proposals — the decode is independent per target; the
    shared (B, K, *) attention tables stay replicated.  No-op otherwise."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or "model" not in getattr(mesh, "axis_names", ()):
        return x
    spec = jax.sharding.PartitionSpec(
        *([None, "model"] + [None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, spec)


class SceneCaptionModule(nn.Module):
    """Vanilla GRU decoder (caption_module.py:40-200)."""

    num_vocabs: int
    emb_size: int = 300
    feat_size: int = 128
    hidden_size: int = 512
    num_proposals: int = 256
    max_des_len: int = 30
    min_iou: float = 0.25
    eval_chunk: int = 32
    # TP-friendly classifier width (0 = unpadded); see _mask_pad_logits
    num_vocabs_padded: int = 0

    def setup(self):
        if self.num_vocabs_padded and self.num_vocabs_padded < self.num_vocabs:
            raise ValueError(
                f"num_vocabs_padded={self.num_vocabs_padded} < "
                f"num_vocabs={self.num_vocabs}")
        self.map_feat = nn.Dense(self.emb_size, name="map_feat")
        self.recurrent_cell = GRUCell(self.emb_size, name="recurrent_cell")
        self.classifier = nn.Dense(
            self.num_vocabs_padded or self.num_vocabs, name="classifier")

    def _class_logits(self, hidden: jax.Array) -> jax.Array:
        return _mask_pad_logits(self.classifier(hidden), self.num_vocabs)

    def __call__(self, data_dict: dict, use_tf: bool = True,
                 is_eval: bool = False) -> dict:
        if not is_eval:
            return self.forward_sample_batch(data_dict)
        return self.forward_scene_batch(data_dict)

    def _decode(self, hidden0: jax.Array, word_embs: Optional[jax.Array],
                emb_table: Optional[jax.Array], num_steps: int,
                teacher_forcing: bool) -> jax.Array:
        """Run the GRU for num_steps; returns logits (N, num_steps, vocab)."""
        sos_input = word_embs[:, 0] if teacher_forcing else word_embs

        def step(carry, t):
            hidden, prev_input = carry
            hidden = self.recurrent_cell(prev_input, hidden)
            logits = self._class_logits(hidden)
            if teacher_forcing:
                nxt = word_embs[:, t + 1]
                out = logits
            else:
                tokens = jnp.argmax(logits, axis=-1)
                nxt = emb_table[tokens]
                # eval consumers only ever argmax the logits
                # (lib/eval_helper.py:56-67) — emit token ids, not the
                # (N, vocab) logit tensor
                out = tokens
            return (hidden, nxt), out

        if self.is_initializing():
            # create params with one eager step; scan would trap them in a trace
            _, out0 = step((hidden0, sos_input), jnp.asarray(0))
            return jnp.zeros(
                (hidden0.shape[0], num_steps) + out0.shape[1:], out0.dtype)

        (_, _), outs = jax.lax.scan(
            step, (hidden0, sos_input), jnp.arange(num_steps))
        return jnp.moveaxis(outs, 0, 1)

    def forward_sample_batch(self, data_dict: dict) -> dict:
        d = dict(data_dict)
        word_embs = d["lang_feat"]                    # (B, T, emb)
        obj_feats = self.map_feat(d["bbox_feature"])
        obj_feats = nn.relu(obj_feats)                # (B, K, emb)
        target_ids, target_ious = select_target(d)
        target_feats = _gather_targets(obj_feats, target_ids)

        T = self.max_des_len + 2
        logits = self._decode(target_feats, word_embs, None, T - 1, True)

        good = target_ious > self.min_iou
        num_good = jnp.sum(good)
        mean_iou = jnp.where(
            num_good > 0, jnp.sum(target_ious * good) / jnp.maximum(num_good, 1), 0.0)

        d["lang_cap"] = logits                        # (B, T-1, vocab)
        d["pred_ious"] = mean_iou
        d["good_bbox_masks"] = good
        return d

    def forward_scene_batch(self, data_dict: dict) -> dict:
        d = dict(data_dict)
        word_embs = d["lang_feat"]
        emb_table = d["glove_emb_table"]              # (vocab, emb)
        obj_feats = nn.relu(self.map_feat(d["bbox_feature"]))  # (B, K, emb)
        B, K, E = obj_feats.shape
        T_dec = self.max_des_len - 1                  # 29 steps (caption_module.py:186)

        sos = word_embs[:, 0]                         # (B, emb)

        def decode_chunk(feats_chunk):                # (B, kc, emb)
            kc = feats_chunk.shape[1]
            h0 = feats_chunk.reshape(B * kc, E)
            sos_rep = jnp.repeat(sos[:, None], kc, axis=1).reshape(B * kc, E)
            tokens = self._decode(h0, sos_rep, emb_table, T_dec, False)
            return tokens.reshape(B, kc, T_dec)

        chunks = []
        for s in range(0, K, self.eval_chunk):
            chunks.append(decode_chunk(obj_feats[:, s:s + self.eval_chunk]))
        d["lang_cap"] = jnp.concatenate(chunks, axis=1)  # (B, K, T_dec) tokens
        return d


class TopDownSceneCaptionModule(nn.Module):
    """2-layer attention decoder (caption_module.py:202-592)."""

    num_vocabs: int
    emb_size: int = 300
    feat_size: int = 128
    hidden_size: int = 512
    num_proposals: int = 256
    num_locals: int = -1
    query_mode: str = "center"
    use_relation: bool = False
    use_oracle: bool = False
    max_des_len: int = 30
    min_iou: float = 0.25
    overlay_threshold: float = 0.5
    eval_chunk: int = 32
    # TP-friendly classifier width (0 = unpadded); see _mask_pad_logits
    num_vocabs_padded: int = 0

    def setup(self):
        if self.num_vocabs_padded and self.num_vocabs_padded < self.num_vocabs:
            raise ValueError(
                f"num_vocabs_padded={self.num_vocabs_padded} < "
                f"num_vocabs={self.num_vocabs}")
        self.map_topdown = nn.Dense(self.emb_size, name="map_topdown")
        self.recurrent_cell_1 = GRUCell(self.hidden_size, name="recurrent_cell_1")
        self.map_feat = nn.Dense(self.hidden_size, use_bias=False, name="map_feat")
        self.map_hidd = nn.Dense(self.hidden_size, use_bias=False, name="map_hidd")
        self.attend = nn.Dense(1, use_bias=False, name="attend")
        self.map_lang = nn.Dense(self.emb_size, name="map_lang")
        self.recurrent_cell_2 = GRUCell(self.hidden_size, name="recurrent_cell_2")
        self.classifier = nn.Dense(
            self.num_vocabs_padded or self.num_vocabs, name="classifier")

    def _class_logits(self, hidden: jax.Array) -> jax.Array:
        return _mask_pad_logits(self.classifier(hidden), self.num_vocabs)

    def __call__(self, data_dict: dict, use_tf: bool = True,
                 is_eval: bool = False) -> dict:
        if not is_eval:
            return self.forward_sample_batch(data_dict)
        return self.forward_scene_batch(data_dict)

    def _decode(
        self,
        target_feat: jax.Array,     # (N, feat)
        obj_feats: jax.Array,       # (N, K, feat)
        mapped_obj: jax.Array,      # (N, K, hidden) — precomputed map_feat
        valid_masks: jax.Array,     # (N, K)
        first_input: jax.Array,     # (N, emb)
        word_embs: Optional[jax.Array],   # (N, T, emb) if teacher forcing
        emb_table: Optional[jax.Array],
        num_steps: int,
        teacher_forcing: bool,
    ) -> Tuple[jax.Array, jax.Array]:
        N = target_feat.shape[0]
        h1 = jnp.zeros((N, self.hidden_size), target_feat.dtype)
        h2 = jnp.zeros((N, self.hidden_size), target_feat.dtype)
        neg_mask = jnp.where(valid_masks[..., None] == 0, -1e30, 0.0)

        def step(carry, t):
            h1, h2, prev = carry
            x = jnp.concatenate([prev, h2, target_feat], axis=-1)
            x = nn.relu(self.map_topdown(x))
            h1n = self.recurrent_cell_1(x, h1)
            combined = jnp.tanh(mapped_obj + self.map_hidd(h1n)[:, None, :])
            scores = self.attend(combined) + neg_mask      # (N, K, 1)
            attn = jax.nn.softmax(scores, axis=1)
            attended = jnp.sum(obj_feats * attn, axis=1)   # (N, feat)
            lang_in = nn.relu(self.map_lang(
                jnp.concatenate([attended, h1n], axis=-1)))
            h2n = self.recurrent_cell_2(lang_in, h2)
            logits = self._class_logits(h2n)
            if teacher_forcing:
                nxt = word_embs[:, t + 1]
                out = logits
            else:
                tokens = jnp.argmax(logits, axis=-1)
                nxt = emb_table[tokens]
                # eval consumers only argmax (lib/eval_helper.py:56-67)
                out = tokens
            return (h1n, h2n, nxt), (out, attn[..., 0])

        if self.is_initializing():
            _, (out0, attn0) = step((h1, h2, first_input), jnp.asarray(0))
            return (
                jnp.zeros((N, num_steps) + out0.shape[1:], out0.dtype),
                jnp.zeros((N,) + attn0.shape[1:] + (num_steps,), attn0.dtype),
            )

        (_, _, _), (outs, attns) = jax.lax.scan(
            step, (h1, h2, first_input), jnp.arange(num_steps))
        # (T, N, ...) -> (N, T, ...); attns (T, N, K) -> (N, K, T)
        return jnp.moveaxis(outs, 0, 1), jnp.transpose(attns, (1, 2, 0))

    def forward_sample_batch(self, data_dict: dict) -> dict:
        d = dict(data_dict)
        word_embs = d["lang_feat"]                    # (B, T, emb)
        obj_feats = d["bbox_feature"]                 # (B, K, feat)
        object_masks = d["bbox_mask"].astype(jnp.float32)
        B, K, _ = obj_feats.shape

        if self.use_oracle:
            target_ids = d["bbox_idx"].astype(jnp.int32)
            target_ious = jnp.ones((B,), jnp.float32)
        else:
            target_ids, target_ious = select_target(d)

        target_feats = _gather_targets(obj_feats, target_ids)

        if self.num_locals == -1:
            valid_masks = object_masks
        else:
            valid_masks = query_locals_for_targets(
                d["bbox_corner"], object_masks, target_ids, self.num_locals,
                self.query_mode, self.overlay_threshold)

        if self.use_relation:
            obj_feats = add_relation_feat(d, obj_feats, target_ids)

        mapped_obj = self.map_feat(obj_feats)
        T = self.max_des_len + 2
        logits, attns = self._decode(
            target_feats, obj_feats, mapped_obj, valid_masks,
            word_embs[:, 0], word_embs, None, T - 1, True)

        good = target_ious > self.min_iou
        num_good = jnp.sum(good)
        mean_iou = jnp.where(
            num_good > 0, jnp.sum(target_ious * good) / jnp.maximum(num_good, 1), 0.0)

        d["lang_cap"] = logits                        # (B, T-1, vocab)
        d["pred_ious"] = mean_iou
        d["topdown_attn"] = attns
        d["valid_masks"] = valid_masks
        d["good_bbox_masks"] = good
        return d

    def _decode_scene(
        self,
        tgt: jax.Array,             # (B, kc, C) target features
        shared_mapped: jax.Array,   # (B, K, H) = map_feat(bbox_feature)
        obj_feats: jax.Array,       # (B, K, C)
        valid: jax.Array,           # (B, kc, K)
        onehot_nbr,                 # (B, kc, L, K) 0/1 or None
        nbr_base,                   # (B, kc, L, H) shared[nbr]+map_feat(rel)
        rel,                        # (B, kc, L, C) or None
        first_input: jax.Array,     # (B, kc, emb)
        emb_table: jax.Array,
        num_steps: int,
    ) -> jax.Array:
        """All-proposals eval decode without the (N, K, H) blowup.

        The reference materializes per-target copies of every proposal's
        attention projection (map_feat of obj+relation, recomputed per step,
        caption_module.py:275-283,529-585); at K=256 targets that tensor is
        (B·kc, K, H) and re-reading it every step makes decoding memory
        bound.  map_feat is linear and relation features touch only the L
        neighbor slots, so attention decomposes into the SHARED (B, K, H)
        projection plus per-target corrections on L slots, mixed in via a
        0/1 one-hot einsum (no scatter/gather inside the scan).  Same math
        up to f32 reassociation."""
        B, kc, C = tgt.shape
        H = self.hidden_size
        # attend is Dense(1, no bias): eye probe recovers its kernel so the
        # score reduce can be written as sum(tanh(...) * w) — a form XLA
        # reliably fuses (Dense on a (B,kc,K,H) tanh would materialize it)
        w = self.attend(jnp.eye(H, dtype=tgt.dtype))[:, 0]          # (H,)
        neg_mask = jnp.where(valid == 0, -1e30, 0.0)                # (B,kc,K)
        covered = (jnp.sum(onehot_nbr, axis=2)
                   if onehot_nbr is not None else None)             # (B,kc,K)
        h1 = jnp.zeros((B, kc, H), tgt.dtype)
        h2 = jnp.zeros((B, kc, H), tgt.dtype)

        def step(carry, t):
            h1, h2, prev = carry
            x = jnp.concatenate([prev, h2, tgt], axis=-1)
            x = nn.relu(self.map_topdown(x))
            h1n = self.recurrent_cell_1(x, h1)                      # (B,kc,H)
            hproj = self.map_hidd(h1n)
            scores = jnp.sum(
                jnp.tanh(shared_mapped[:, None] + hproj[:, :, None]) * w,
                axis=-1)                                            # (B,kc,K)
            if onehot_nbr is not None:
                s_nbr = jnp.sum(
                    jnp.tanh(nbr_base + hproj[:, :, None]) * w, axis=-1)
                corr = jnp.einsum("btl,btlk->btk", s_nbr, onehot_nbr)
                scores = jnp.where(covered > 0, corr, scores)
            attn = jax.nn.softmax(scores + neg_mask, axis=-1)
            attended = jnp.einsum("btk,bkc->btc", attn, obj_feats)
            if onehot_nbr is not None:
                attn_nbr = jnp.einsum("btk,btlk->btl", attn, onehot_nbr)
                attended = attended + jnp.sum(
                    attn_nbr[..., None] * rel, axis=2)
            lang_in = nn.relu(self.map_lang(
                jnp.concatenate([attended, h1n], axis=-1)))
            h2n = self.recurrent_cell_2(lang_in, h2)
            logits = self._class_logits(h2n)
            tokens = jnp.argmax(logits, axis=-1)                    # (B,kc)
            nxt = emb_table[tokens]
            return (h1n, h2n, nxt), (tokens, attn)

        K = shared_mapped.shape[1]
        if self.is_initializing():
            step((h1, h2, first_input), jnp.asarray(0))
            return (jnp.zeros((B, kc, num_steps), jnp.int32),
                    jnp.zeros((B, kc, num_steps, K), tgt.dtype))

        (_, _, _), (outs, attns) = jax.lax.scan(
            step, (h1, h2, first_input), jnp.arange(num_steps))
        # (T,B,kc[,K]) -> (B,kc,T[,K]); attn here spans ALL K proposals —
        # the reference's full topdown_attn form (num_locals == -1)
        return (jnp.transpose(outs, (1, 2, 0)),
                jnp.transpose(attns, (1, 2, 0, 3)))

    def _decode_scene_local(
        self,
        tgt: jax.Array,             # (B, kc, C) target features
        base_loc: jax.Array,        # (B, kc, L, H) attention base per slot
        ctx_loc: jax.Array,         # (B, kc, L, C) obj(+rel) per slot
        first_input: jax.Array,     # (B, kc, emb)
        emb_table: jax.Array,
        num_steps: int,
    ) -> jax.Array:
        """All-proposals eval decode with attention over the L LOCAL slots
        only.

        The reference scores every one of the K=256 proposals per target per
        step and then masks all but the num_locals+self local ones to -1e30
        (caption_module.py:275-283); exp(-1e30) underflows to exactly 0 in
        f32, so the masked slots contribute nothing to the softmax or the
        attended sum.  Gathering the L local slots' projections once per
        target (outside the scan) and scoring only those is therefore the
        same math up to f32 reassociation — and shrinks the per-step additive
        -attention tensor from (B, kc, K, H) to (B, kc, L, H), ~K/L = 25x.
        Relation corrections (nbr_base = shared + map_feat(rel)) are folded
        into base_loc/ctx_loc by the caller via index-equality matching."""
        B, kc, _ = tgt.shape
        H = self.hidden_size
        w = self.attend(jnp.eye(H, dtype=tgt.dtype))[:, 0]          # (H,)
        h1 = jnp.zeros((B, kc, H), tgt.dtype)
        h2 = jnp.zeros((B, kc, H), tgt.dtype)

        def step(carry, t):
            h1, h2, prev = carry
            x = jnp.concatenate([prev, h2, tgt], axis=-1)
            x = nn.relu(self.map_topdown(x))
            h1n = self.recurrent_cell_1(x, h1)                      # (B,kc,H)
            hproj = self.map_hidd(h1n)
            scores = jnp.sum(
                jnp.tanh(base_loc + hproj[:, :, None]) * w,
                axis=-1)                                            # (B,kc,L)
            attn = jax.nn.softmax(scores, axis=-1)
            attended = jnp.einsum("btl,btlc->btc", attn, ctx_loc)
            lang_in = nn.relu(self.map_lang(
                jnp.concatenate([attended, h1n], axis=-1)))
            h2n = self.recurrent_cell_2(lang_in, h2)
            logits = self._class_logits(h2n)
            tokens = jnp.argmax(logits, axis=-1)                    # (B,kc)
            nxt = emb_table[tokens]
            return (h1n, h2n, nxt), (tokens, attn)

        L = base_loc.shape[2]
        if self.is_initializing():
            step((h1, h2, first_input), jnp.asarray(0))
            return (jnp.zeros((B, kc, num_steps), jnp.int32),
                    jnp.zeros((B, kc, num_steps, L), tgt.dtype))

        (_, _, _), (outs, attns) = jax.lax.scan(
            step, (h1, h2, first_input), jnp.arange(num_steps))
        # (T,B,kc[,L]) -> (B,kc,T[,L]); attn is the per-step softmax over the
        # L local slots — exactly the nonzero entries of the reference's
        # full-K "topdown_attn" masks (all other slots underflow to 0)
        return (jnp.transpose(outs, (1, 2, 0)),
                jnp.transpose(attns, (1, 2, 0, 3)))

    def forward_scene_batch(self, data_dict: dict) -> dict:
        d = dict(data_dict)
        word_embs = d["lang_feat"]
        emb_table = d["glove_emb_table"]
        obj_feats = d["bbox_feature"]                 # (B, K, feat)
        object_masks = d["bbox_mask"].astype(jnp.float32)
        B, K, C = obj_feats.shape
        T_dec = self.max_des_len - 1                  # 29 (caption_module.py:505)
        sos = word_embs[:, 0]

        if self.num_locals == -1:
            all_valid = jnp.broadcast_to(object_masks[:, None, :], (B, K, K))
        else:
            all_valid, loc_idx = query_locals_dense(
                d["bbox_corner"], object_masks, self.num_locals,
                self.query_mode, include_self=True,
                overlay_threshold=self.overlay_threshold)

        shared_mapped = self.map_feat(obj_feats)      # (B, K, H)

        if self.num_locals != -1:
            # Local-slot eval decode: attention sees exactly the L slots of
            # loc_idx (every other slot is -1e30-masked in the reference, so
            # its softmax weight is exactly 0).  Gather their projections and
            # features once, fold relation corrections in by index matching,
            # then decode all targets in one scan.
            L = self.num_locals
            flat = loc_idx.reshape(B, K * L)
            sh_loc = jnp.take_along_axis(
                shared_mapped, flat[..., None], axis=1).reshape(B, K, L, -1)
            obj_loc = jnp.take_along_axis(
                obj_feats, flat[..., None], axis=1).reshape(B, K, L, C)
            if self.use_relation:
                rel_all = d["edge_feature"]           # (B, K, Le, C)
                nbr_all = d["edge_nbr_idx"]           # (B, K, Le)
                # map_feat is linear (no bias): map_feat(obj + scatter(rel))
                # == shared + scatter(map_feat(rel)); only neighbor slots are
                # corrected.  match[b,t,l,j] = I[loc_idx==nbr(j)] (nbr rows
                # are distinct, so at most one j matches per slot).
                delta = self.map_feat(rel_all)        # (B, K, Le, H)
                match = (loc_idx[:, :, :, None]
                         == nbr_all[:, :, None, :]).astype(obj_feats.dtype)
                sh_loc = sh_loc + jnp.einsum("btlj,btjh->btlh", match, delta)
                obj_loc = obj_loc + jnp.einsum(
                    "btlj,btjc->btlc", match, rel_all)

            # one scan over all K targets: the per-step working set is only
            # (B, K, L, ·) so the (B·kc, K, H) memory pressure that forced
            # eval_chunk on the full-K path is gone
            d["lang_cap"], d["topdown_attn"] = self._decode_scene_local(
                _shard_targets(obj_feats),
                _shard_targets(sh_loc),
                _shard_targets(obj_loc),
                jnp.broadcast_to(sos[:, None], (B, K, sos.shape[-1])),
                emb_table, T_dec)
            d["topdown_attn_slots"] = loc_idx         # (B, K, L) proposal ids
            d["valid_masks"] = all_valid
            return d

        if self.use_relation:
            rel_all = d["edge_feature"]               # (B, K, L, C)
            nbr_all = d["edge_nbr_idx"]               # (B, K, L)
            L = nbr_all.shape[-1]
            # map_feat is linear (no bias): map_feat(obj + scatter(rel)) ==
            # shared + scatter(map_feat(rel)); neighbor slots are the only
            # corrected ones
            delta = self.map_feat(rel_all)            # (B, K, L, H)
            sh_nbr = jnp.take_along_axis(
                shared_mapped, nbr_all.reshape(B, K * L)[..., None], axis=1
            ).reshape(B, K, L, -1)
            nbr_base_all = sh_nbr + delta
            onehot_all = jax.nn.one_hot(
                nbr_all, K, dtype=obj_feats.dtype)    # (B, K, L, K)

        chunks = []
        for s in range(0, K, self.eval_chunk):
            kc = min(self.eval_chunk, K - s)
            sl = slice(s, s + kc)
            chunks.append(self._decode_scene(
                _shard_targets(obj_feats[:, sl]), shared_mapped, obj_feats,
                _shard_targets(all_valid[:, sl]),
                _shard_targets(onehot_all[:, sl]) if self.use_relation else None,
                _shard_targets(nbr_base_all[:, sl]) if self.use_relation else None,
                _shard_targets(rel_all[:, sl]) if self.use_relation else None,
                jnp.broadcast_to(sos[:, None], (B, kc, sos.shape[-1])),
                emb_table, T_dec))
        d["lang_cap"] = jnp.concatenate(
            [c[0] for c in chunks], axis=1)              # (B, K, T_dec) tokens
        d["topdown_attn"] = jnp.concatenate(
            [c[1] for c in chunks], axis=1)              # (B, K, T, K)
        d["valid_masks"] = all_valid
        return d
