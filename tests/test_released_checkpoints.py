"""Converter coverage over the reference's RELEASED checkpoints.

The reference ships eight trained detector/extractor checkpoints
(/root/reference/pretrained/*/model.pth — the warm-starts its
scripts/train.py:80-105 and extract_*_features.py load).  These tests
convert each REAL file and export it back, asserting the round-trip is
bit-exact over every tensor — so the converter demonstrably covers every
key the released artifacts actually contain (dtype quirks, BN running
stats, num_batches_tracked), not just torch-initialized replicas.  The
full-chain OUTPUT parity on real weights lives in
test_convert_votenet_chain.py::test_released_checkpoint_chain_parity.
"""

import glob
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from scan2cap_tpu.convert import (convert_votenet_checkpoint,
                                  export_votenet_checkpoint)

RELEASED = sorted(glob.glob("/root/reference/pretrained/*/model.pth"))


@pytest.mark.skipif(not RELEASED, reason="released checkpoints not present")
@pytest.mark.parametrize("pth", RELEASED,
                         ids=[p.split("/")[-2] for p in RELEASED])
def test_released_checkpoint_round_trips_bit_exact(pth):
    params, stats = convert_votenet_checkpoint(pth)
    sd_back = export_votenet_checkpoint(params, stats)
    sd_ref = torch.load(pth, map_location="cpu")
    # detection tree only: drop keys outside backbone_net/vgen/proposal
    # (released files contain exactly these three modules today; a future
    # variant with extra heads should fail loudly below, not silently pass)
    ref_keys = {k for k in sd_ref
                if k.split(".")[0] in ("backbone_net", "vgen", "proposal")}
    assert ref_keys == set(sd_ref.keys()), sorted(
        set(sd_ref) - ref_keys)[:5]
    missing = ref_keys - set(sd_back.keys())
    extra = set(sd_back.keys()) - ref_keys
    assert not missing, sorted(missing)[:5]
    assert not extra, sorted(extra)[:5]
    for k in sorted(ref_keys):
        a = sd_ref[k].detach().cpu().numpy()
        b = sd_back[k].detach().cpu().numpy()
        if k.endswith("num_batches_tracked"):
            continue  # export restarts the counter; torch ignores it in eval
        np.testing.assert_array_equal(a, b, err_msg=k)
