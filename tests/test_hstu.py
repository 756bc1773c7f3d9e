"""HSTU encoder unit tests: relative-bias math, masking, cache-free parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rails_tpu.core.config import HSTUConfig, get_experiment_config
from rails_tpu.data.datasets import get_reco_dataset
from rails_tpu.models.hstu import (
    HSTUStack,
    RelativeBucketedTimeAndPositionBias,
    StackedRelativeBias,
    _bucketize_time_delta,
)


class TestRelativeBias:
    def test_stacked_matches_per_block_module(self):
        """StackedRelativeBias[l] must equal the standalone per-block module
        given the same weights."""
        n, L, nb = 12, 3, 16
        ts = jnp.asarray(
            np.random.default_rng(0).integers(1_000, 1_000_000, size=(4, n))
        )
        stacked = StackedRelativeBias(num_blocks=L, max_seq_len=n, num_buckets=nb)
        sp = stacked.init(jax.random.PRNGKey(0), ts)
        out = stacked.apply(sp, ts)         # (L, B, N, N)
        single = RelativeBucketedTimeAndPositionBias(max_seq_len=n, num_buckets=nb)
        for l in range(L):
            params_l = {
                "params": {
                    "pos_w": sp["params"]["pos_w"][l],
                    "ts_w": sp["params"]["ts_w"][l],
                }
            }
            ref = single.apply(params_l, ts)
            np.testing.assert_allclose(
                np.asarray(out[l]), np.asarray(ref), rtol=1e-6, atol=1e-6
            )

    def test_position_bias_diagonal_structure(self):
        """bias[i, j] with equal timestamps depends only on j - i."""
        n = 8
        ts = jnp.full((1, n), 1000, dtype=jnp.int32)
        mod = RelativeBucketedTimeAndPositionBias(max_seq_len=n, num_buckets=4)
        p = mod.init(jax.random.PRNGKey(1), ts)
        bias = np.asarray(mod.apply(p, ts))[0]
        # All timestamp deltas are 0 -> same bucket everywhere, so differences
        # along diagonals come from pos_w only: constant per diagonal.
        for off in range(-(n - 1), n):
            diag = np.diagonal(bias, offset=off)
            np.testing.assert_allclose(diag, diag[0], rtol=1e-6)

    def test_bucketization(self):
        x = jnp.array([0, 1, 2, 10, 100, 10_000, -50])
        b = np.asarray(_bucketize_time_delta(x, 128))
        assert b[0] == 0 and b[1] == 0
        assert b[3] == int(np.log(10) / 0.301)
        assert b[6] == int(np.log(50) / 0.301)
        assert (b <= 128).all()


class TestHSTUMasking:
    def test_causality(self):
        """Changing a later item must not affect earlier outputs."""
        cfg = get_experiment_config("synthetic-small")
        ds = get_reco_dataset(cfg.data)
        from rails_tpu.train.loop import create_train_state

        batch = next(
            ds.train_dataset.batches(
                batch_size=4, max_output_length=cfg.train.gr_output_length + 1,
                shuffle=False,
            )
        )
        model, state, _, _ = create_train_state(
            cfg, ds.max_item_id, ds.all_item_ids, batch
        )
        feats = batch.features
        out1 = model.apply(state.params, feats, method=model.encode_sequence)
        # Mutate the item at the last valid position of row 0.
        pos = int(feats.lengths[0]) - 1
        ids2 = feats.ids.at[0, pos].set((int(feats.ids[0, pos]) % 100) + 1)
        out2 = model.apply(
            state.params, feats._replace(ids=ids2), method=model.encode_sequence
        )
        a, b = np.asarray(out1), np.asarray(out2)
        # Outputs strictly before the mutated position are unchanged.
        np.testing.assert_allclose(a[0, :pos], b[0, :pos], rtol=1e-5, atol=1e-6)
        # The mutated position itself changes.
        assert np.abs(a[0, pos] - b[0, pos]).max() > 1e-6

    def test_truncated_serving_matches_full_padding(self):
        """Encoding with a shorter padded axis (all lengths fit) must equal
        the full-padded encode — trained weights are length-agnostic."""
        from rails_tpu.data.features import serving_pad_length, truncate_features
        from rails_tpu.train.loop import create_train_state

        cfg = get_experiment_config("synthetic-small")
        ds = get_reco_dataset(cfg.data)
        batch = next(
            ds.train_dataset.batches(
                batch_size=4, max_output_length=cfg.train.gr_output_length + 1,
                shuffle=False,
            )
        )
        model, state, _, _ = create_train_state(
            cfg, ds.max_item_id, ds.all_item_ids, batch
        )
        feats = batch.features
        full = model.apply(state.params, feats, method=model.encode)
        n = serving_pad_length(int(feats.lengths.max()), multiple=8)
        assert n < feats.ids.shape[1]
        short = truncate_features(feats, n)
        got = model.apply(state.params, short, method=model.encode)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(full), rtol=2e-5, atol=2e-6
        )

    def test_padding_invariance(self):
        """Values in padded positions must not influence valid outputs."""
        cfg = get_experiment_config("synthetic-small")
        ds = get_reco_dataset(cfg.data)
        from rails_tpu.train.loop import create_train_state

        batch = next(
            ds.train_dataset.batches(
                batch_size=4, max_output_length=cfg.train.gr_output_length + 1,
                shuffle=False,
            )
        )
        model, state, _, _ = create_train_state(
            cfg, ds.max_item_id, ds.all_item_ids, batch
        )
        feats = batch.features
        q1 = model.apply(state.params, feats, method=model.encode)
        # Garbage in the padding region. Note position `length` is legitimately
        # read by the time-delta bias (ts(next-item) semantics; the training
        # path scatters the target timestamp there), so garbage starts at
        # length + 1.
        n = feats.ids.shape[1]
        id_mask = np.arange(n)[None, :] >= np.asarray(feats.lengths)[:, None]
        ts_mask = np.arange(n)[None, :] >= (np.asarray(feats.lengths)[:, None] + 1)
        ids2 = jnp.where(jnp.asarray(id_mask), 7, feats.ids)
        ts2 = jnp.where(jnp.asarray(ts_mask), 123456, feats.timestamps)
        q2 = model.apply(
            state.params, feats._replace(ids=ids2, timestamps=ts2),
            method=model.encode,
        )
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=1e-5, atol=1e-6)


class TestHSTUVariants:
    @pytest.mark.parametrize(
        "variant",
        [{"concat_ua": True}, {"normalization": "softmax_rel_bias"},
         {"concat_ua": True, "normalization": "softmax_rel_bias"}],
    )
    def test_variant_trains_and_decodes(self, variant):
        """concat_ua / softmax attention variants: finite training loss and
        incremental-decode parity with the full forward."""
        import jax.numpy as jnp
        from rails_tpu.train.loop import create_train_state

        cfg = get_experiment_config("synthetic-small")
        cfg = cfg.replace(
            hstu=cfg.hstu.replace(**variant),
            data=cfg.data.replace(synthetic_num_users=64, synthetic_num_items=100),
            train=cfg.train.replace(local_batch_size=8, num_negatives=8),
        )
        ds = get_reco_dataset(cfg.data)
        batch = next(
            ds.train_dataset.batches(
                batch_size=8, max_output_length=cfg.train.gr_output_length + 1,
                shuffle=False,
            )
        )
        model, state, train_step, _ = create_train_state(
            cfg, ds.max_item_id, ds.all_item_ids, batch
        )
        import jax as _jax

        state, m = train_step(state, batch, _jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))

        feats = batch.features
        b = feats.ids.shape[0]
        rows = jnp.arange(b)
        ids_full = feats.ids.at[rows, feats.lengths].set(batch.target_ids)
        feats_full = feats._replace(ids=ids_full, lengths=feats.lengths + 1)
        expected = model.apply(state.params, feats_full, method=model.encode)
        _, cache = model.apply(state.params, feats, method=model.encode_prefill)
        got, _ = model.apply(
            state.params, batch.target_ids, feats, cache, method=model.decode_step
        )
        # Softmax attention sums ~N exp terms whose reassociation between the
        # (B,h,N,N) and (B,h,N) layouts shifts results by ~1e-3 after the
        # u*a gating; the SiLU path is tighter.
        tol = 2e-3 if variant.get("normalization") == "softmax_rel_bias" else 3e-4
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), rtol=tol, atol=tol
        )
