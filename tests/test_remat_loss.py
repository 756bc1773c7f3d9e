"""Activation-checkpointed loss equals the plain loss (values + grads)."""

import numpy as np
import jax
import jax.numpy as jnp

from rails_tpu.core.config import get_experiment_config
from rails_tpu.data.datasets import get_reco_dataset
from rails_tpu.losses.sampled_softmax import sampled_softmax_loss
from rails_tpu.train.loop import create_train_state, scatter_target, _make_sampler


def test_remat_loss_matches_plain():
    cfg = get_experiment_config("synthetic-small")
    cfg = cfg.replace(
        data=cfg.data.replace(synthetic_num_users=64, synthetic_num_items=100),
        # Zero all dropout: the chunked path folds the dropout rng per chunk
        # (a different — equally valid — random draw), so bit-comparison is
        # only meaningful deterministically.
        mol=cfg.mol.replace(
            softmax_dropout_rate=0.0, item_dropout_rate=0.0,
            query_dropout_rate=0.0, uid_dropout_rate=0.0,
        ),
        train=cfg.train.replace(
            local_batch_size=8, num_negatives=8, dropout_rate=0.0,
        ),
    )
    ds = get_reco_dataset(cfg.data)
    batch = next(
        ds.train_dataset.batches(
            batch_size=8, max_output_length=cfg.train.gr_output_length + 1,
            shuffle=False,
        )
    )
    model, state, _, sampler = create_train_state(
        cfg, ds.max_item_id, ds.all_item_ids, batch
    )
    feats = scatter_target(batch.features, batch.target_ids)
    rngs = {"dropout": jax.random.PRNGKey(1), "sampler": jax.random.PRNGKey(2)}

    def loss(params, ckpt):
        l, _ = model.apply(
            params, feats, sampler, 8, 1.0, True, ckpt,
            method=sampled_softmax_loss, rngs=rngs,
        )
        return l

    v0, g0 = jax.value_and_grad(loss)(state.params, False)
    v1, g1 = jax.value_and_grad(loss)(state.params, True)
    # Remat must be bit-compatible up to reassociation: identical rngs and
    # math, only the storage schedule differs.
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
