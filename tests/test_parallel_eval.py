"""Multi-chip eval: data-parallel scenes + proposal-axis (model) sharding of
the caption eval decode, on the 8-virtual-device CPU mesh.  Sharded output
must equal the single-device decode exactly (token ids)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from scan2cap_tpu.config import Config, ModelConfig
from scan2cap_tpu.data.synthetic import make_scene_batch, make_vocab
from scan2cap_tpu.models import CapNet
from scan2cap_tpu.parallel import make_mesh, shard_batch
from scan2cap_tpu.train import create_train_state, make_eval_step

TINY = ModelConfig(
    num_points=256, num_proposals=16, sa_npoints=(64, 32, 16, 16),
    max_num_obj=8, num_locals=4, num_graph_steps=2, use_topdown=True,
    use_relation=True, use_orientation=True, min_iou=-1.0)


def test_eval_step_data_and_proposal_sharded():
    assert jax.device_count() >= 8
    cfg = Config(model=TINY)
    vocab = make_vocab(num_vocabs=32)
    batch = make_scene_batch(TINY, batch_size=4, num_objects=3, vocab=vocab)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = CapNet(TINY, num_vocabs=32)
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
    step = make_eval_step(cfg, model)

    want = np.asarray(step(state, batch)["lang_cap"])   # single device

    mesh = make_mesh(n_data=4, n_model=2)
    sbatch = shard_batch(batch, mesh)
    state_r = jax.device_put(state, NamedSharding(mesh, P()))
    with jax.set_mesh(mesh):
        out = step(state_r, sbatch)
        got = np.asarray(out["lang_cap"])
    np.testing.assert_array_equal(got, want)


def test_padded_vocab():
    from scan2cap_tpu.parallel import padded_vocab

    # ScanRefer's 3433 on a 2-way model axis -> 3456 = 27*128 (the padded
    # point measured in TPU_DESIGN §12's collective-bytes study)
    assert padded_vocab(3433, 2) == 3456
    assert padded_vocab(3433, 1) == 3456          # lane padding alone
    assert padded_vocab(3456, 2) == 3456          # already aligned: no-op
    assert padded_vocab(3433, 3) == 3456          # lcm(3,128)=384; 9*384
    assert padded_vocab(1, 8, multiple=1) == 8    # divisibility only
    for nm in (1, 2, 4, 8):
        p = padded_vocab(3433, nm)
        assert p >= 3433 and p % nm == 0 and p % 128 == 0
