"""Caption-metric tests.

Parity: my BLEU/CIDEr/ROUGE implementations are compared against the
reference's pure-Python coco-caption ports (imported from /root/reference as
a test oracle when present) on randomized corpora.  Plus hand-checked values.
"""

import os
import sys

import numpy as np
import pytest

from scan2cap_tpu.eval.capeval import Bleu, Cider, Rouge, Meteor

REF = "/root/reference/lib/capeval"
HAS_REF = os.path.isdir(REF)


def random_corpus(rng, n_keys=20, vocab=30, n_refs=3):
    words = [f"w{i}" for i in range(vocab)]
    gts, res = {}, {}
    for i in range(n_keys):
        key = f"scene{i}|{i}|obj"
        gts[key] = [
            "sos " + " ".join(rng.choice(words, rng.randint(3, 15))) + " eos"
            for _ in range(rng.randint(1, n_refs + 1))]
        res[key] = [
            "sos " + " ".join(rng.choice(words, rng.randint(2, 14))) + " eos"]
    return gts, res


@pytest.fixture
def corpus(rng):
    return random_corpus(rng)


def _load_ref_module(name, path):
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not HAS_REF, reason="reference capeval not present")
def test_bleu_matches_reference(corpus):
    gts, res = corpus
    scorer_mod = _load_ref_module(
        "ref_bleu_scorer", os.path.join(REF, "bleu/bleu_scorer.py"))
    scorer = scorer_mod.BleuScorer(n=4)
    for key in gts:  # as lib/capeval/bleu/bleu.py:21-40 does
        scorer += (res[key][0], gts[key])
    want, want_per = scorer.compute_score(option="closest", verbose=0)
    got, got_per = Bleu(4).compute_score(gts, res)
    np.testing.assert_allclose(got, want, rtol=1e-10)
    for k in range(4):
        np.testing.assert_allclose(got_per[k], want_per[k], rtol=1e-10)


@pytest.mark.skipif(not HAS_REF, reason="reference capeval not present")
def test_cider_matches_reference(corpus):
    gts, res = corpus
    scorer_mod = _load_ref_module(
        "ref_cider_scorer", os.path.join(REF, "cider/cider_scorer.py"))
    scorer = scorer_mod.CiderScorer(n=4, sigma=6.0)
    for key in gts:  # as lib/capeval/cider/cider.py:24-41 does
        scorer += (res[key][0], gts[key])
    want, want_per = scorer.compute_score()
    got, got_per = Cider().compute_score(gts, res)
    np.testing.assert_allclose(got, want, rtol=1e-10)
    np.testing.assert_allclose(got_per, want_per, rtol=1e-10)


@pytest.mark.skipif(not HAS_REF, reason="reference capeval not present")
def test_rouge_matches_reference(corpus):
    gts, res = corpus
    ref_rouge = _load_ref_module("ref_rouge", os.path.join(REF, "rouge/rouge.py"))
    want, want_per = ref_rouge.Rouge().compute_score(gts, res)
    got, got_per = Rouge().compute_score(gts, res)
    np.testing.assert_allclose(got, want, rtol=1e-10)
    np.testing.assert_allclose(got_per, want_per, rtol=1e-10)


def test_bleu_perfect_match():
    gts = {"a": ["sos the red chair eos"]}
    res = {"a": ["sos the red chair eos"]}
    scores, _ = Bleu(4).compute_score(gts, res)
    for s in scores:
        assert abs(s - 1.0) < 1e-6


def test_cider_identical_corpus_positive(rng):
    gts, _ = random_corpus(rng, n_keys=10)
    res = {k: [v[0]] for k, v in gts.items()}
    score, per = Cider().compute_score(gts, res)
    assert score > 1.0  # identical captions score high (max 10)
    assert (per >= 0).all()


def test_rouge_known_value():
    # candidate = reference -> P=R=1 -> F=1
    gts = {"a": ["x y z"]}
    res = {"a": ["x y z"]}
    score, _ = Rouge().compute_score(gts, res)
    assert abs(score - 1.0) < 1e-9


def test_meteor_sanity():
    gts = {"a": ["sos the red chair eos"], "b": ["sos a big table eos"]}
    res = {"a": ["sos the red chair eos"], "b": ["sos small dog eos"]}
    m = Meteor()
    score, per = m.compute_score(gts, res)
    assert per[0] > 0.9      # perfect match, small chunk penalty only
    assert per[1] < per[0]
    assert 0 <= score <= 1


def test_meteor_stemming_matches():
    from scan2cap_tpu.eval.capeval.meteor import single_meteor_score
    s_exact = single_meteor_score("the chairs are red", "the chairs are red")
    # stem stage recovers chair->chairs, so the alignment is identical
    s_stem = single_meteor_score("the chairs are red", "the chair are red")
    s_partial = single_meteor_score("the chairs are red", "the sofa is red")
    s_none = single_meteor_score("the chairs are red", "blue table")
    assert s_exact == s_stem > s_partial > s_none == 0.0


METEOR_PIN_CORPUS = {
    "k1": ["sos this is a brown chair near the door eos",
           "sos a chair beside the doorway eos"],
    "k2": ["sos the table is white and round eos"],
    "k3": ["sos a large sofa sits against the wall eos"],
}
METEOR_PIN_CANDS = {
    "k1": ["sos this is a brown seat near the door eos"],
    "k2": ["sos the desk is white and circular eos"],
    "k3": ["sos sos eos"],
}
# exact+stem only (no synonym stage of any kind)
METEOR_PIN_EXACT_STEM = np.array([0.8950617284, 0.703125, 0.119047619])
# + curated domain synset table: seat<->chair and circular<->round match,
# desk<->table deliberately does NOT (not WordNet-synonymous)
METEOR_PIN_DOMSYN = np.array([0.9995, 0.8647959183673469, 0.119047619])


def test_meteor_backend_and_pinned_corpus():
    """Pinned-corpus METEOR fixture: anchors the builtin scorer and
    documents the three-way backend contract.  Without the nltk wordnet
    corpus the curated domain synset table scores (exact pins); with it
    the wordnet stage takes over (scores can only go UP vs exact+stem —
    extra matches only add to the F-mean)."""
    from scan2cap_tpu.eval.capeval.meteor import (
        _HAS_WORDNET, METEOR_BACKEND, Meteor, single_meteor_score)

    scorer = Meteor()
    mean, per = scorer.compute_score(METEOR_PIN_CORPUS, METEOR_PIN_CANDS)
    if not _HAS_WORDNET:
        assert METEOR_BACKEND == "builtin-exact-stem-domsyn" == scorer.backend
        np.testing.assert_allclose(per, METEOR_PIN_DOMSYN, atol=1e-9)
        np.testing.assert_allclose(mean, 0.6611145124716554, atol=1e-12)
    else:
        assert METEOR_BACKEND == "builtin-exact-stem-wordnet"
        assert (per >= METEOR_PIN_EXACT_STEM - 1e-9).all()

    assert single_meteor_score("a b c d", "a b c d") == pytest.approx(
        0.9921875)                            # 1-chunk penalty gamma*(1/m)^3
    assert single_meteor_score("a b", "c d") == 0.0


def test_meteor_no_domsyn_knob_restores_exact_stem():
    """SCAN2CAP_METEOR_NO_DOMSYN=1 (read at import) disables the table and
    reproduces the round-2 exact+stem pins — the A/B used to quantify the
    synonym-stage delta (scripts/micro_meteor_delta.py)."""
    import json
    import subprocess
    import sys

    # import the meteor module FILE directly — the package __init__ pulls
    # in jax/flax (~8 s on this host) that this subprocess doesn't need.
    # Stub parent packages keep meteor.py's intra-package imports working.
    pkg_dir = os.path.abspath(
        os.path.join(os.path.dirname(__file__), os.pardir, "scan2cap_tpu"))
    code = (
        "import json, os, sys, types, importlib.util\n"
        f"root = {pkg_dir!r}\n"
        "dirs = {'scan2cap_tpu': root,"
        " 'scan2cap_tpu.eval': os.path.join(root, 'eval'),"
        " 'scan2cap_tpu.eval.capeval':"
        " os.path.join(root, 'eval', 'capeval')}\n"
        "for name, d in dirs.items():\n"
        "    mod = types.ModuleType(name); mod.__path__ = [d]\n"
        "    sys.modules.setdefault(name, mod)\n"
        "spec = importlib.util.spec_from_file_location(\n"
        "    'scan2cap_tpu.eval.capeval.meteor',\n"
        "    os.path.join(dirs['scan2cap_tpu.eval.capeval'], 'meteor.py'))\n"
        "m = importlib.util.module_from_spec(spec)\n"
        "sys.modules['scan2cap_tpu.eval.capeval.meteor'] = m\n"
        "spec.loader.exec_module(m)\n"
        f"gts = {METEOR_PIN_CORPUS!r}\n"
        f"res = {METEOR_PIN_CANDS!r}\n"
        "mean, per = m.Meteor().compute_score(gts, res)\n"
        "print(json.dumps({'backend': m.METEOR_BACKEND, 'per': list(per)}))\n"
    )
    env = dict(os.environ, SCAN2CAP_METEOR_NO_DOMSYN="1")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    got = json.loads(out.stdout.strip().splitlines()[-1])
    if got["backend"] == "builtin-exact-stem":
        np.testing.assert_allclose(got["per"], METEOR_PIN_EXACT_STEM,
                                   atol=1e-9)
    else:       # wordnet corpus present on this host: knob is a no-op
        assert got["backend"] == "builtin-exact-stem-wordnet"


def test_domsyn_table_conservative():
    from scan2cap_tpu.eval.capeval.synonyms import synonym_ids

    def syn(a, b):
        ia, ib = synonym_ids(a), synonym_ids(b)
        return bool(ia) and not ia.isdisjoint(ib)

    assert syn("couch", "sofa")
    assert syn("SEAT", "chair")            # case-insensitive
    assert syn("fridge", "refrigerator")
    assert syn("trash", "garbage")
    assert not syn("desk", "table")        # WordNet keeps these separate
    assert not syn("cup", "mug")
    assert not syn("navy", "blue")
    assert not syn("chair", "xyzzy")
    assert not syn("xyzzy", "xyzzy")       # unknown words never match here
    # polysemy: stool is seating AND toilet, via different groups
    assert syn("stool", "seat")
    assert syn("stool", "toilet")
    assert not syn("bench", "toilet")
    # relating to a common word is NOT transitive synonymy: stool and
    # bench each share a group with "seat" but not with each other
    assert not syn("stool", "bench")


def test_meteor_backend_recorded_in_densecap_results():
    from scan2cap_tpu.eval import benchmark as bm

    gts = {"scene0000_00": {
        "captions": [["sos a red chair eos"]],
        "boxes": np.array([[[0, 0, 0]] * 4 + [[1, 1, 1]] * 4], float),
        "object_ids": np.array([3]),
        "object_sems": np.array([4]),
    }}
    preds = {"scene0000_00": {
        "captions": ["sos a red chair eos"],
        "boxes": gts["scene0000_00"]["boxes"].copy(),
        "sem_prob": np.ones((1, 18)) / 18.0,
        "obj_prob": np.array([[0.1, 0.9]]),
    }}
    res = bm.evaluate_dense_captioning(preds, gts, verbose=False)
    assert res["meteor_backend"] == bm.SENTENCE_METEOR_BACKEND
