"""Binned Pallas scatter-add: parity with XLA's dense gather cotangent.

The kernel (`ops/pallas/scatter_add.py`) must reproduce
``zeros.at[ids].add(rows)`` exactly (fp32 accumulation) across duplicate
ids, block-boundary ids, out-of-range ids, partial last blocks, and
sub-chunk update counts — and, through `gather_rows`' custom VJP, leave
every training gradient unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rails_tpu.core.config import get_experiment_config
from rails_tpu.data.datasets import get_reco_dataset
from rails_tpu.ops.pallas.scatter_add import gather_rows, scatter_add_rows
from rails_tpu.train.loop import create_train_state


def _ref(ids, rows, num_rows):
    return (
        jnp.zeros((num_rows, rows.shape[-1]), jnp.float32)
        .at[ids.reshape(-1)]
        .add(rows.reshape(-1, rows.shape[-1]).astype(jnp.float32))
    )


@pytest.mark.parametrize(
    "num_rows,m,block_rows,chunk",
    [
        (5000, 1300, 2048, 512),   # partial last block
        (4096, 700, 1024, 256),    # exact block multiple
        (300, 40, 256, 64),        # m < chunk (padding path)
        (2048, 2048, 2048, 128),   # single block, many chunks
    ],
)
def test_scatter_matches_at_add(num_rows, m, block_rows, chunk):
    rng = np.random.default_rng(num_rows + m)
    # Heavy duplicates (popular items) + exact block-boundary ids.
    ids = np.concatenate(
        [
            rng.integers(0, num_rows, m - 20),
            rng.integers(0, 5, 10),
            np.array([0, num_rows - 1, block_rows - 1]
                     if num_rows > block_rows else [0, num_rows - 1, 1]),
            np.full(7, min(block_rows, num_rows) - 1),
        ]
    ).astype(np.int32)[:m]
    rows = rng.standard_normal((m, 64)).astype(np.float32)
    out = scatter_add_rows(
        jnp.asarray(ids), jnp.asarray(rows), num_rows,
        block_rows=block_rows, chunk=chunk,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(jnp.asarray(ids), jnp.asarray(rows),
                                         num_rows)),
        rtol=1e-6, atol=1e-6,
    )


def test_scatter_out_of_range_id_semantics():
    """`.at[ids].add` wraps negative ids once (numpy semantics) and drops
    out-of-bounds ids; the kernel must match both."""
    ids = jnp.asarray([0, 3, 9, 10, 500, 2**30, -1, -7, -100], jnp.int32)
    rows = jnp.ones((9, 8), jnp.float32)
    out = scatter_add_rows(ids, rows, 10, block_rows=8, chunk=8)
    ref = jnp.zeros((10, 8)).at[ids].add(rows)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_scatter_bf16_rows_accumulate_fp32():
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, 50, 400), jnp.int32)
    rows = jnp.asarray(rng.standard_normal((400, 32)), jnp.bfloat16)
    out = scatter_add_rows(ids, rows, 50, block_rows=64, chunk=128,
                           out_dtype=jnp.float32)
    # fp32 accumulation of the bf16 values.
    ref = jnp.zeros((50, 32), jnp.float32).at[ids].add(
        rows.astype(jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_gather_rows_grad_matches_plain():
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.standard_normal((777, 48)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 777, (6, 31)), jnp.int32)  # 2-D ids
    w = jnp.asarray(rng.standard_normal((6, 31, 48)), jnp.float32)
    f_plain = lambda t: jnp.sum(jnp.tanh(t[ids]) * w)         # noqa: E731
    f_kernel = lambda t: jnp.sum(jnp.tanh(gather_rows(t, ids)) * w)  # noqa: E731
    assert float(f_plain(table)) == pytest.approx(float(f_kernel(table)))
    g_plain = jax.grad(f_plain)(table)
    g_kernel = jax.grad(f_kernel)(table)
    np.testing.assert_allclose(
        np.asarray(g_plain), np.asarray(g_kernel), rtol=1e-6, atol=1e-6
    )


def test_scatter_kernel_composes_with_fused_mol_loss():
    """Both custom VJPs on one chain — the fused MoL loss kernel produces
    the embedding cotangents, the scatter kernel turns them into the dense
    table gradient. The scatter flag must not change loss or params."""
    base = get_experiment_config("synthetic-small")
    base = base.replace(
        data=base.data.replace(synthetic_num_users=64,
                               synthetic_num_items=120),
        mol=base.mol.replace(
            softmax_dropout_rate=0.0, gating_qi_dropout_rate=0.0,
            query_dropout_rate=0.0, item_dropout_rate=0.0,
            uid_dropout_rate=0.0,
        ),
        train=base.train.replace(
            local_batch_size=8, num_negatives=8,
            shared_negatives=True, fused_mol_loss=True,
        ),
    )
    ds = get_reco_dataset(base.data)
    batch = next(
        ds.train_dataset.batches(
            batch_size=8, max_output_length=base.train.gr_output_length + 1,
            shuffle=False,
        )
    )
    rng = jax.random.PRNGKey(0)
    results = {}
    for flag in (False, True):
        cfg = base.replace(train=base.train.replace(pallas_scatter_grad=flag))
        _, state, train_step, _ = create_train_state(
            cfg, ds.max_item_id, ds.all_item_ids, batch
        )
        state2, metrics = train_step(state, batch, rng)
        results[flag] = (float(metrics["loss"]), state2.params)
    assert results[False][0] == pytest.approx(results[True][0], rel=1e-6)
    flat_a = jax.tree_util.tree_leaves_with_path(results[False][1])
    flat_b = jax.tree_util.tree_leaves(results[True][1])
    for (path, a), b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_train_step_parity_with_scatter_kernel():
    """One full train step: identical loss and identical post-step params
    with `train.pallas_scatter_grad` on vs off."""
    base = get_experiment_config("synthetic-small")
    base = base.replace(
        data=base.data.replace(synthetic_num_users=64,
                               synthetic_num_items=120),
        train=base.train.replace(local_batch_size=8, num_negatives=8),
    )
    ds = get_reco_dataset(base.data)
    batch = next(
        ds.train_dataset.batches(
            batch_size=8, max_output_length=base.train.gr_output_length + 1,
            shuffle=False,
        )
    )
    rng = jax.random.PRNGKey(0)
    results = {}
    for flag in (False, True):
        cfg = base.replace(train=base.train.replace(pallas_scatter_grad=flag))
        _, state, train_step, _ = create_train_state(
            cfg, ds.max_item_id, ds.all_item_ids, batch
        )
        state2, metrics = train_step(state, batch, rng)
        results[flag] = (float(metrics["loss"]), state2.params)
    assert results[False][0] == pytest.approx(results[True][0], rel=1e-6)
    flat_a = jax.tree_util.tree_leaves_with_path(results[False][1])
    flat_b = jax.tree_util.tree_leaves(results[True][1])
    for (path, a), b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-6,
            err_msg=jax.tree_util.keystr(path),
        )
