"""From-equations numpy anchors for the full train path.

Real ML-1M data is unobtainable in this environment (zero network egress and
the reference ships git-LFS stubs — see docs/STATUS.md), so semantic parity is
anchored the other way: every stage of the training computation is verified
step-for-step against a deliberately naive numpy implementation written
directly from the papers/reference equations —

  1. the FULL ml-1m-geometry HSTU forward (8 blocks, 2 heads, rel pos + time
     bias, N=211) against a loop-free-but-naive numpy encoder;
  2. the sampled-softmax loss (positives + R sampled negatives through MoL,
     accidental-hit masking, temperature, weighted mean) against numpy with
     the identical sampled negative ids;
  3. the AdamW update rule against its update equations;
  4. the end-to-end gradient of the total loss against central finite
     differences along random parameter directions.

Together these certify forward, loss, optimizer, and backward — the
components whose composition the README numbers measure.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rails_tpu.core.config import (
    DataConfig,
    ExperimentConfig,
    HSTUConfig,
    MoLConfig,
    TrainConfig,
    get_experiment_config,
)
from rails_tpu.data.datasets import get_reco_dataset
from rails_tpu.losses.samplers import LocalNegativesSampler
from rails_tpu.losses.sampled_softmax import sampled_softmax_loss
from rails_tpu.models.encoder import SequentialRecommender
from rails_tpu.train.loop import create_train_state, scatter_target

from tests.test_mol import naive_mol


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _ln(x, eps):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps)


def numpy_hstu_encode_sequence(params, cfg, feats):
    """`SequentialRecommender.encode_sequence` from the HSTU equations
    (arXiv 2402.17152; reference `modeling/sequential/hstu.py`), positional
    preprocessor, eval mode. All float64 numpy."""
    p = params["params"]
    d = cfg.train.item_embedding_dim
    hc = cfg.hstu
    ids = np.asarray(feats.ids)
    b, n = ids.shape
    lengths = np.asarray(feats.lengths)

    # Embedding + positional preprocessor (emb * sqrt(D) + pos, masked).
    table = np.asarray(p["item_emb"]["embedding"], np.float64)
    x = table[ids] * np.sqrt(d) + np.asarray(
        p["input_preproc"]["pos_emb"], np.float64
    )[None, :n]
    valid = np.arange(n)[None, :] < lengths[:, None]
    x = x * valid[..., None]

    # Relative position + bucketized time-delta bias, per block.
    pos_w = np.asarray(p["hstu"]["rel_attn_bias"]["pos_w"], np.float64)
    ts_w = np.asarray(p["hstu"]["rel_attn_bias"]["ts_w"], np.float64)
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    rel_pos = pos_w[:, j - i + n - 1]                       # (L, n, n)
    ts = np.asarray(feats.timestamps, np.int64)
    ext = np.concatenate([ts, ts[:, -1:]], axis=1)
    delta = ext[:, 1:, None] - ext[:, None, :-1]            # (B, n, n)
    v = np.log(np.maximum(np.abs(delta).astype(np.float64), 1.0)) / 0.301
    buckets = np.clip(v.astype(np.int32), 0, hc.num_time_buckets)

    mask = np.tril(np.ones((n, n)))[None] * valid[:, None, :]
    h, dqk, dv = hc.num_heads, hc.dqk, hc.dv
    for l in range(hc.num_blocks):
        blk = p["hstu"][f"block_{l}"]
        bias = rel_pos[l][None] + ts_w[l][buckets]          # (B, n, n)
        y = _ln(x, hc.epsilon) @ np.asarray(blk["uvqk"], np.float64)
        y = _silu(y)
        u = y[..., : h * dv]
        vv = y[..., h * dv : 2 * h * dv]
        q = y[..., 2 * h * dv : 2 * h * dv + h * dqk]
        k = y[..., 2 * h * dv + h * dqk :]
        qk = np.einsum(
            "bnhd,bmhd->bhnm",
            q.reshape(b, n, h, dqk), k.reshape(b, n, h, dqk),
        ) + bias[:, None]
        attn = _silu(qk) * (1.0 / n) * mask[:, None]
        out = np.einsum(
            "bhnm,bmhd->bnhd", attn, vv.reshape(b, n, h, dv)
        ).reshape(b, n, h * dv)
        o_in = u * _ln(out, hc.epsilon)
        x = o_in @ np.asarray(blk["o_kernel"], np.float64) + np.asarray(
            blk["o_bias"], np.float64
        ) + x

    x = x * valid[..., None]
    y = x[..., :d]
    if cfg.train.user_embedding_norm == "layer_norm":
        return _ln(y, 1e-6)
    return y / np.maximum(np.sqrt((y**2).sum(-1, keepdims=True)), 1e-6)


def _synthetic_features(cfg, b, seed=0):
    from rails_tpu.data.features import batch_from_rows

    rng = np.random.default_rng(seed)
    n_hist = cfg.data.max_sequence_length
    num_items = 500
    lengths = rng.integers(3, n_hist, size=(b,))
    ids = np.zeros((b, n_hist), np.int32)
    ratings = np.zeros((b, n_hist), np.int32)
    ts = np.zeros((b, n_hist), np.int64)
    for r in range(b):
        L = lengths[r]
        ids[r, :L] = rng.integers(1, num_items, size=L)
        ratings[r, :L] = rng.integers(1, 6, size=L)
        ts[r, :L] = np.sort(rng.integers(1, 1_000_000, size=L))
    batch = batch_from_rows(
        lengths.astype(np.int32), ids, ratings, ts,
        rng.integers(1, num_items, size=b).astype(np.int32),
        rng.integers(1, 6, size=b).astype(np.int32),
        (ts.max(axis=1) + 10).astype(np.int64),
        rng.integers(1, 100, size=b).astype(np.int32),
        max_output_length=cfg.train.gr_output_length + 1,
    )
    return batch, num_items


class TestHSTUForwardParityML1MGeometry:
    def test_encode_sequence_matches_equations(self):
        """Full ml-1m HSTU geometry (8 blocks x 2 heads, d50, N=211) against
        the numpy-from-equations encoder."""
        cfg = get_experiment_config("ml-1m-hstu-mol")
        batch, num_items = _synthetic_features(cfg, b=2)
        model = SequentialRecommender(cfg=cfg, num_items=num_items)
        params = jax.jit(
            lambda r, f: model.init(r, f, method=model.encode_sequence)
        )(jax.random.PRNGKey(0), batch.features)

        got = np.asarray(
            jax.jit(
                lambda p, f: model.apply(p, f, method=model.encode_sequence)
            )(params, batch.features)
        )
        want = numpy_hstu_encode_sequence(params, cfg, batch.features)
        assert got.shape == want.shape == (
            2, cfg.max_seq_len_padded, cfg.train.item_embedding_dim
        )
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def _tiny_loss_cfg():
    return ExperimentConfig(
        name="parity-tiny",
        model_type="HSTU",
        similarity_type="MoL",
        mol=MoLConfig(
            query_embedding_dim=12,
            item_embedding_dim=12,
            dot_product_dimension=8,
            query_dot_product_groups=4,
            item_dot_product_groups=3,
            query_hidden_dim=16,
            query_nonlinearity="swiglu",
            query_dropout_rate=0.0,
            item_hidden_dim=-1,
            item_dropout_rate=0.0,
            uid_embedding_hash_sizes=(17,),
            uid_dropout_rate=0.0,
            gating_query_hidden_dim=8,
            gating_item_hidden_dim=8,
            gating_qi_hidden_dim=8,
            gating_qi_dropout_rate=0.0,
            temperature=0.05,
            softmax_dropout_rate=0.0,
            gating_combination_type="glu_silu",
        ),
        hstu=HSTUConfig(
            embedding_dim=12, num_blocks=2, num_heads=2, dqk=4, dv=4,
            linear_dropout_rate=0.0,
        ),
        data=DataConfig(
            dataset_name="synthetic", max_sequence_length=6,
            synthetic_num_users=32, synthetic_num_items=40,
        ),
        train=TrainConfig(
            local_batch_size=3, item_embedding_dim=12, dropout_rate=0.0,
            num_negatives=4, temperature=0.8,
            loss_weights=(("uid_embedding_l2_norm", 0.1), ("mi_loss", 0.001)),
            gr_output_length=1,
        ),
    )


class RecordingSampler(LocalNegativesSampler):
    """LocalNegativesSampler that records the concrete sampled ids so the
    numpy loss can consume the identical negatives."""

    record = []

    def sample(self, rng, shape):
        out = LocalNegativesSampler.sample(self, rng, shape)
        RecordingSampler.record.append(np.asarray(out))
        return out


class TestSampledSoftmaxLossParity:
    def test_loss_matches_equations(self):
        cfg = _tiny_loss_cfg()
        ds = get_reco_dataset(cfg.data)
        batch = next(
            ds.train_dataset.batches(
                batch_size=cfg.train.local_batch_size,
                max_output_length=cfg.train.gr_output_length + 1,
                shuffle=False, drop_last=True,
            )
        )
        feats = scatter_target(batch.features, batch.target_ids)
        model = SequentialRecommender(cfg=cfg, num_items=ds.max_item_id)
        sampler = RecordingSampler(
            all_item_ids=jnp.asarray(ds.all_item_ids, jnp.int32)
        )
        rngs = {
            "params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "sampler": jax.random.PRNGKey(2),
        }
        params = model.init(
            rngs, feats, sampler, cfg.train.num_negatives,
            cfg.train.temperature, True, method=sampled_softmax_loss,
        )
        RecordingSampler.record.clear()
        loss, aux = model.apply(
            params, feats, sampler, cfg.train.num_negatives,
            cfg.train.temperature, True, method=sampled_softmax_loss,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "sampler": jax.random.PRNGKey(2)},
        )
        (sampled_ids,) = RecordingSampler.record

        # ----- numpy from equations -----
        ids = np.asarray(feats.ids)
        b, n = ids.shape
        d = cfg.train.item_embedding_dim
        seq = numpy_hstu_encode_sequence(params, cfg, feats)   # (B, N, D)
        table = np.asarray(params["params"]["item_emb"]["embedding"], np.float64)

        q = seq[:, :-1].reshape(-1, d)                         # (M, D)
        sup_ids = ids[:, 1:].reshape(-1)
        pos_emb = table[ids[:, 1:]].reshape(-1, d)
        uids = np.repeat(np.asarray(feats.user_ids), n - 1)
        w = (
            (ids[:, 1:] != 0)
            & (np.arange(n - 1)[None] < np.asarray(feats.lengths)[:, None])
        ).reshape(-1).astype(np.float64)

        mol_params = {"params": params["params"]["mol"]}
        m = q.shape[0]
        r = cfg.train.num_negatives
        logits = np.zeros((m, 1 + r))
        for row in range(m):
            items_row = np.concatenate(
                [pos_emb[row][None], table[sampled_ids[row]]], axis=0
            )
            logits[row] = naive_mol(
                mol_params, cfg.mol, q[row][None].astype(np.float32),
                items_row.astype(np.float32), uids[row][None],
            )[0]
        logits = logits / cfg.train.temperature
        hit = sup_ids[:, None] == np.asarray(sampled_ids)      # (M, R)
        logits[:, 1:] = np.where(hit, -5e4, logits[:, 1:])
        mx = logits.max(1)
        lse = np.log(np.exp(logits - mx[:, None]).sum(1))
        per_pos = -(logits[:, 0] - mx) + lse         # -log_softmax[..., 0]
        want = float((per_pos * w).sum() / w.sum())

        np.testing.assert_allclose(float(loss), want, rtol=2e-4)
        assert np.isfinite(float(aux["mi_loss"]))


class TestAdamWParity:
    def test_update_matches_equations(self):
        import optax

        lr, b1, b2, eps, wd = 1e-3, 0.9, 0.98, 1e-8, 1e-3
        opt = optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
        rng = np.random.default_rng(0)
        p = {"w": rng.normal(size=(5, 3)).astype(np.float32),
             "b": rng.normal(size=(3,)).astype(np.float32)}
        params = jax.tree_util.tree_map(jnp.asarray, p)
        state = opt.init(params)

        mp = {k: np.zeros_like(v) for k, v in p.items()}
        vp = {k: np.zeros_like(v) for k, v in p.items()}
        cur = {k: v.copy() for k, v in p.items()}
        for t in range(1, 3):
            g = {k: rng.normal(size=v.shape).astype(np.float32)
                 for k, v in p.items()}
            updates, state = opt.update(
                jax.tree_util.tree_map(jnp.asarray, g), state, params
            )
            params = optax.apply_updates(params, updates)
            for k in cur:
                mp[k] = b1 * mp[k] + (1 - b1) * g[k]
                vp[k] = b2 * vp[k] + (1 - b2) * g[k] ** 2
                mhat = mp[k] / (1 - b1**t)
                vhat = vp[k] / (1 - b2**t)
                cur[k] = cur[k] - lr * (mhat / (np.sqrt(vhat) + eps) + wd * cur[k])
        for k in cur:
            np.testing.assert_allclose(
                np.asarray(params[k]), cur[k], rtol=1e-5, atol=1e-6
            )


class TestGradientAgainstFiniteDifferences:
    def test_directional_derivatives(self):
        """jax.grad of the total train loss vs central finite differences
        along random parameter directions — certifies the backward pass the
        optimizer consumes."""
        from rails_tpu.losses.sampled_softmax import get_weighted_loss

        cfg = _tiny_loss_cfg()
        ds = get_reco_dataset(cfg.data)
        batch = next(
            ds.train_dataset.batches(
                batch_size=cfg.train.local_batch_size,
                max_output_length=cfg.train.gr_output_length + 1,
                shuffle=False, drop_last=True,
            )
        )
        feats = scatter_target(batch.features, batch.target_ids)
        model = SequentialRecommender(cfg=cfg, num_items=ds.max_item_id)
        sampler = LocalNegativesSampler(
            all_item_ids=jnp.asarray(ds.all_item_ids, jnp.int32)
        )
        rngs = {
            "params": jax.random.PRNGKey(3),
            "dropout": jax.random.PRNGKey(4),
            "sampler": jax.random.PRNGKey(5),
        }
        params = model.init(
            rngs, feats, sampler, cfg.train.num_negatives,
            cfg.train.temperature, True, method=sampled_softmax_loss,
        )
        weights = dict(cfg.train.loss_weights)

        @jax.jit
        def loss_fn(p):
            main, aux = model.apply(
                p, feats, sampler, cfg.train.num_negatives,
                cfg.train.temperature, True, method=sampled_softmax_loss,
                rngs={"dropout": jax.random.PRNGKey(4),
                      "sampler": jax.random.PRNGKey(5)},
            )
            return get_weighted_loss(main, aux, weights)

        grads = jax.jit(jax.grad(loss_fn))(params)
        leaves, treedef = jax.tree_util.tree_flatten(params)
        gleaves = jax.tree_util.tree_leaves(grads)
        pnorm = float(
            jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves))
        )
        eps = 1e-4 * pnorm
        rng = np.random.default_rng(11)
        checked = 0
        for trial in range(6):
            vs = [
                jnp.asarray(
                    rng.normal(size=l.shape).astype(np.float32)
                    / np.sqrt(sum(int(np.prod(x.shape)) for x in leaves))
                )
                for l in leaves
            ]
            analytic = float(
                sum(jnp.sum(g.astype(jnp.float32) * v)
                    for g, v in zip(gleaves, vs))
            )
            plus = jax.tree_util.tree_unflatten(
                treedef, [l + eps * v for l, v in zip(leaves, vs)]
            )
            minus = jax.tree_util.tree_unflatten(
                treedef, [l - eps * v for l, v in zip(leaves, vs)]
            )
            fd = (float(loss_fn(plus)) - float(loss_fn(minus))) / (2 * eps)
            if abs(analytic) < 1e-4:
                continue   # direction nearly orthogonal to the gradient
            assert abs(fd - analytic) <= 2e-2 * abs(analytic) + 1e-5, (
                trial, fd, analytic,
            )
            checked += 1
        assert checked >= 3
