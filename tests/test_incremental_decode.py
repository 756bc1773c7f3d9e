"""Incremental decode (KV cache) parity with the full forward pass."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rails_tpu.core.config import get_experiment_config
from rails_tpu.data.datasets import get_reco_dataset
from rails_tpu.train.loop import create_train_state


@pytest.fixture(scope="module")
def setup():
    cfg = get_experiment_config("synthetic-small")
    cfg = cfg.replace(
        data=cfg.data.replace(synthetic_num_users=64, synthetic_num_items=200),
        train=cfg.train.replace(local_batch_size=8, num_negatives=8),
    )
    ds = get_reco_dataset(cfg.data)
    batch = next(
        ds.train_dataset.batches(
            batch_size=8, max_output_length=cfg.train.gr_output_length + 1,
            shuffle=False,
        )
    )
    model, state, _, _ = create_train_state(
        cfg, ds.max_item_id, ds.all_item_ids, batch
    )
    return cfg, ds, model, state.params, batch


def test_decode_step_matches_full_forward(setup):
    """prefill(length L) + decode_step(new item) == encode(length L+1)."""
    cfg, ds, model, params, batch = setup
    feats = batch.features

    # Full-forward target: append the target id at position `length` and
    # encode with lengths + 1.
    b = feats.ids.shape[0]
    rows = jnp.arange(b)
    ids_full = feats.ids.at[rows, feats.lengths].set(batch.target_ids)
    feats_full = feats._replace(ids=ids_full, lengths=feats.lengths + 1)
    expected = model.apply(params, feats_full, method=model.encode)

    # Incremental: prefill at length L, then decode the appended item.
    _, cache = model.apply(params, feats, method=model.encode_prefill)
    got, _ = model.apply(
        params, batch.target_ids, feats, cache, method=model.decode_step
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-4, atol=2e-4
    )


def test_prefill_matches_encode(setup):
    cfg, ds, model, params, batch = setup
    feats = batch.features
    ref = model.apply(params, feats, method=model.encode)
    got, cache = model.apply(params, feats, method=model.encode_prefill)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)
    assert len(cache) == cfg.hstu.num_blocks


def test_multi_step_decode(setup):
    """Two successive decode steps == full forward with two appended items."""
    cfg, ds, model, params, batch = setup
    feats = batch.features
    b = feats.ids.shape[0]
    rows = jnp.arange(b)
    second_ids = (batch.target_ids % ds.max_item_id) + 1

    ids_full = feats.ids.at[rows, feats.lengths].set(batch.target_ids)
    ids_full = ids_full.at[rows, feats.lengths + 1].set(second_ids)
    feats_full = feats._replace(ids=ids_full, lengths=feats.lengths + 2)
    expected = model.apply(params, feats_full, method=model.encode)

    _, cache = model.apply(params, feats, method=model.encode_prefill)
    _, cache = model.apply(
        params, batch.target_ids, feats, cache, method=model.decode_step
    )
    feats2 = feats._replace(lengths=feats.lengths + 1)
    got, _ = model.apply(
        params, second_ids, feats2, cache, method=model.decode_step
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-4, atol=2e-4
    )
