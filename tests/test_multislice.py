"""Multi-slice mesh topology (SURVEY.md section 5 "DCN for multi-slice"),
validated on the virtual 8-device CPU mesh as 2 slices x 2 data x 2 item.

The slice axis is pure data parallelism over DCN: batches shard over
(slice, data), params replicate, the corpus shards over `item` within each
slice. Training steps and sharded top-k must produce the same numbers as the
single-slice (2-D) mesh — the topology only changes which wires the
collectives ride.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rails_tpu.core.config import MeshConfig, get_experiment_config
from rails_tpu.core.mesh import (
    DATA_AXIS,
    ITEM_AXIS,
    SLICE_AXIS,
    batch_axes,
    make_mesh,
    replicate,
    shard_batch,
)
from rails_tpu.data.datasets import get_reco_dataset
from rails_tpu.index.sharded import make_sharded_top_k_fn, pad_and_shard_state
from rails_tpu.index.top_k import build_mol_topk_state, mol_brute_force_top_k
from rails_tpu.train.loop import create_train_state

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)


@pytest.fixture(scope="module")
def setup():
    cfg = get_experiment_config("synthetic-small")
    cfg = cfg.replace(
        data=cfg.data.replace(synthetic_num_users=64, synthetic_num_items=200),
        train=cfg.train.replace(local_batch_size=16, num_negatives=8),
    )
    ds = get_reco_dataset(cfg.data)
    batches = list(
        ds.train_dataset.batches(
            batch_size=16, max_output_length=cfg.train.gr_output_length + 1,
            shuffle=True, seed=0, drop_last=True,
        )
    )
    model, state, train_step, _ = create_train_state(
        cfg, ds.max_item_id, ds.all_item_ids, batches[0]
    )
    return cfg, ds, model, state, train_step, batches


class TestMeshConstruction:
    def test_three_axis_mesh(self):
        mesh = make_mesh(MeshConfig(num_slices=2, data_parallel=2, item_parallel=2))
        assert mesh.axis_names == (SLICE_AXIS, DATA_AXIS, ITEM_AXIS)
        assert dict(mesh.shape) == {SLICE_AXIS: 2, DATA_AXIS: 2, ITEM_AXIS: 2}
        assert batch_axes(mesh) == (SLICE_AXIS, DATA_AXIS)

    def test_two_axis_mesh_unchanged(self):
        mesh = make_mesh(MeshConfig(item_parallel=2))
        assert mesh.axis_names == (DATA_AXIS, ITEM_AXIS)
        assert batch_axes(mesh) == (DATA_AXIS,)

    def test_bad_factorization_raises(self):
        with pytest.raises(ValueError):
            make_mesh(MeshConfig(num_slices=3, item_parallel=2))


class TestMultiSliceTraining:
    def test_train_step_matches_single_slice(self, setup):
        cfg, ds, model, state, train_step, batches = setup
        rng = jax.random.PRNGKey(0)

        # train_step donates its state arg; hand each mesh its own copy.
        copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)

        mesh1 = make_mesh(MeshConfig(data_parallel=8, item_parallel=1))
        s1 = replicate(copy(state), mesh1)
        b1 = shard_batch(batches[0], mesh1)
        s1, m1 = train_step(s1, b1, rng)

        mesh2 = make_mesh(
            MeshConfig(num_slices=2, data_parallel=4, item_parallel=1)
        )
        s2 = replicate(copy(state), mesh2)
        b2 = shard_batch(batches[0], mesh2)
        s2, m2 = train_step(s2, b2, rng)

        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-5
        )
        l1 = jax.tree_util.tree_leaves(s1.params)
        l2 = jax.tree_util.tree_leaves(s2.params)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
            )


class TestMultiSliceTopK:
    def test_sharded_topk_exact_on_slice_mesh(self, setup):
        cfg, ds, model, state, train_step, batches = setup
        params = state.params
        item_ids = jnp.asarray(np.asarray(ds.all_item_ids))
        emb = model.apply(
            params, item_ids, method=model.get_item_embeddings
        )
        topk_state = build_mol_topk_state(
            model, params, item_ids, emb, table_dtype=jnp.float32
        )
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        exact = mol_brute_force_top_k(
            model, params, topk_state, q, 10, user_ids=feats.user_ids
        )

        mesh = make_mesh(
            MeshConfig(num_slices=2, data_parallel=2, item_parallel=2)
        )
        sh_state = pad_and_shard_state(topk_state, mesh)
        fn = make_sharded_top_k_fn(
            "MoLBruteForceTopK", model, params, sh_state, mesh, k=10
        )
        res = fn(q, user_ids=feats.user_ids)
        np.testing.assert_allclose(
            np.asarray(res.scores), np.asarray(exact.scores),
            rtol=1e-5, atol=1e-5,
        )
