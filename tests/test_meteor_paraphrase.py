"""File-gated METEOR paraphrase stage (eval/capeval/paraphrase.py).

The reference scores captions with meteor-1.5, whose fourth matcher
module consumes a paraphrase table (lib/capeval/meteor/meteor.py:15-45).
The builtin backend activates an equivalent stage only when a table file
is supplied; these tests inject tiny tables directly and via the env gate.
"""

import gzip
import os
import subprocess
import sys

import pytest

from scan2cap_tpu.eval.capeval.meteor import single_meteor_score
from scan2cap_tpu.eval.capeval.paraphrase import (
    ParaphraseTable, _parse_line, phrase_stage)


def _table(pairs, max_len=None):
    raw = {}
    ml = 1
    for a, b in pairs:
        raw.setdefault(a, set()).add(b)
        raw.setdefault(b, set()).add(a)
        ml = max(ml, a.count(" ") + 1, b.count(" ") + 1)
    return ParaphraseTable({k: frozenset(v) for k, v in raw.items()},
                           max_len or ml)


def test_parse_line_formats():
    assert _parse_line("next to ||| beside") == ("next to", "beside")
    assert _parse_line("0.87 ||| next to ||| beside") == ("next to", "beside")
    assert _parse_line("next to\tbeside") == ("next to", "beside")
    assert _parse_line("next to\tbeside\t0.87") == ("next to", "beside")
    assert _parse_line("Next To ||| BESIDE") == ("next to", "beside")
    assert _parse_line("# comment") is None
    assert _parse_line("") is None
    assert _parse_line("no separator here") is None
    assert _parse_line(" ||| empty side") is None


@pytest.mark.parametrize("gz", [False, True])
def test_table_load(tmp_path, gz):
    body = ("# header comment\n"
            "0.9 ||| next to ||| beside\n"
            "couch\tsofa\n"
            "same ||| same\n"          # self-pairs dropped
            "\n")
    p = tmp_path / ("t.gz" if gz else "t.txt")
    if gz:
        with gzip.open(p, "wt", encoding="utf-8") as f:
            f.write(body)
    else:
        p.write_text(body)
    t = ParaphraseTable.load(str(p))
    assert len(t) == 2
    assert t.max_len == 2
    assert "beside" in t.others("next to")
    assert "next to" in t.others("beside")
    assert "sofa" in t.others("couch")
    assert t.others("same") == frozenset()
    assert t.others("unknown") == frozenset()


def test_phrase_stage_spans():
    hyp = "the chair is beside the table".split()
    ref = "the chair is next to the table".split()
    used_h = [False] * len(hyp)
    used_r = [False] * len(ref)
    # pretend the word stages matched everything except beside/next-to
    for i, w in enumerate(hyp):
        if w != "beside":
            used_h[i] = True
    for j, w in enumerate(ref):
        if w not in ("next", "to"):
            used_r[j] = True
    t = _table([("next to", "beside")])
    matches, m_h, m_r = phrase_stage(hyp, ref, used_h, used_r, t)
    assert (m_h, m_r) == (1, 2)          # 1 hyp word covers 2 ref words
    assert matches == [(3, 3)]           # pairs the first min(lh,lr) words
    assert all(used_h) and all(used_r)


def test_phrase_stage_respects_used_tokens():
    hyp = "a b".split()
    ref = "c d".split()
    t = _table([("a b", "c d")])
    used_h = [False, True]               # one hyp token already matched
    used_r = [False, False]
    matches, m_h, m_r = phrase_stage(hyp, ref, used_h, used_r, t)
    assert matches == [] and m_h == 0 and m_r == 0


def test_score_improves_with_table():
    ref = "the chair is next to the table"
    hyp = "the chair is beside the table"
    base = single_meteor_score(ref, hyp, syn_stage=None, para=None)
    t = _table([("next to", "beside")])
    with_t = single_meteor_score(ref, hyp, syn_stage=None, para=t)
    assert with_t > base
    # every word on both sides matched -> precision = recall = 1
    # matches: 5 word pairs + 1 span pair = 6 contiguous-ish chunks check:
    # (0,0),(1,1),(2,2),(3,3),(4,5),(5,6) -> chunks: {0,1,2,3},{4,5} = 2
    m_h, m_r = 6, 7
    frag = 2 / ((m_h + m_r) / 2)
    expected = (1 - 0.5 * frag ** 3) * 1.0
    assert with_t == pytest.approx(expected, abs=1e-12)


def test_score_unchanged_without_table():
    # para=None and para="auto" (no file on this host) must agree
    ref = "a red chair sits in the corner"
    hyp = "the red chair is in a corner"
    assert single_meteor_score(ref, hyp, para=None) == \
        single_meteor_score(ref, hyp)


def test_env_gate_activates_backend(tmp_path):
    p = tmp_path / "para.txt"
    p.write_text("next to ||| beside\n")
    code = (
        "from scan2cap_tpu.eval.capeval.meteor import METEOR_BACKEND,"
        " single_meteor_score\n"
        "assert METEOR_BACKEND.endswith('-paraphrase'), METEOR_BACKEND\n"
        "a = single_meteor_score('the chair is next to the table',"
        " 'the chair is beside the table', syn_stage=None)\n"
        "b = single_meteor_score('the chair is next to the table',"
        " 'the chair is beside the table', syn_stage=None, para=None)\n"
        "assert a > b, (a, b)\n"
        "print('ok')\n"
    )
    env = dict(os.environ, SCAN2CAP_METEOR_PARAPHRASE=str(p))
    env.setdefault("JAX_PLATFORMS", "cpu")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout
