"""MoL similarity unit tests.

The vectorized module is checked against a deliberately naive, loop-based
reimplementation of the MoL math (written from the equations, using the same
parameter values), covering the einsum layout (`bnd,xmd->bxnm` flattened as
n*P_X+m), l2 normalization, gating combination, and softmax combine.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rails_tpu.core.config import MoLConfig
from rails_tpu.similarity.mol import MoLSimilarity, load_balancing_mi_loss


def small_cfg(**kw):
    base = dict(
        query_embedding_dim=12,
        item_embedding_dim=10,
        dot_product_dimension=8,
        query_dot_product_groups=4,
        item_dot_product_groups=3,
        query_hidden_dim=16,
        query_nonlinearity="swiglu",
        item_hidden_dim=-1,
        uid_embedding_hash_sizes=(17,),
        gating_query_hidden_dim=8,
        gating_item_hidden_dim=8,
        gating_qi_hidden_dim=8,
        temperature=0.05,
        softmax_dropout_rate=0.2,
    )
    base.update(kw)
    return MoLConfig(**base)


def _silu(x):
    return x * (1.0 / (1.0 + np.exp(-x)))


def _gelu(x):
    # Exact erf form (matches torch F.gelu and the repo's GLU layers).
    from scipy.special import erf

    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def _l2(x, eps=1e-6):
    n = np.sqrt((x**2).sum(-1, keepdims=True))
    return x / np.maximum(n, eps)


def naive_mol(params, cfg, q, items, user_ids):
    """Loop-based MoL forward in numpy (eval mode). items: (X, D')."""
    p = params["params"]

    def dense(pp, x):
        y = x @ np.asarray(pp["kernel"])
        if "bias" in pp:
            y = y + np.asarray(pp["bias"])
        return y

    def proj_mlp(pp, x, hidden, nonlin):
        if hidden > 0:
            y = dense(pp["glu"]["w"], x)
            lhs, rhs = np.split(y, 2, axis=-1)
            act = _gelu if nonlin == "geglu" else _silu
            x = act(lhs) * rhs
        return dense(pp["out"], x)

    def gating_mlp(pp, x):
        if "hidden" in pp:
            x = _silu(dense(pp["hidden"], x))
        return dense(pp["out"], x)

    B = q.shape[0]
    X = items.shape[0]
    d_p = cfg.dot_product_dimension
    # Query components.
    qc = proj_mlp(p["query_proj"], q, cfg.query_hidden_dim, cfg.query_nonlinearity)
    qc = qc.reshape(B, cfg.query_proj_groups, d_p)
    uid_list = []
    for i, h in enumerate(cfg.uid_embedding_hash_sizes):
        table = np.asarray(p[f"uid_embeddings_{i}"]["embedding"])
        uid_list.append(table[(user_ids % h) + 1][:, None, :])
    if uid_list:
        qc = np.concatenate([qc] + uid_list, axis=1)
    qc = _l2(qc)
    # Item components.
    ic = proj_mlp(p["item_proj"], items, cfg.item_hidden_dim, cfg.item_nonlinearity)
    ic = ic.reshape(X, cfg.item_dot_product_groups, d_p)
    ic = _l2(ic)
    # Logits, flattened n*P_X + m.
    L = cfg.num_logits
    logits = np.zeros((B, X, L))
    for b in range(B):
        for x in range(X):
            for n in range(cfg.query_dot_product_groups):
                for m in range(cfg.item_dot_product_groups):
                    logits[b, x, n * cfg.item_dot_product_groups + m] = np.dot(
                        qc[b, n], ic[x, m]
                    )
    logits = logits / cfg.temperature
    # Gating.
    qp = gating_mlp(p["gating_query"], q)            # (B, L)
    ip = gating_mlp(p["gating_item"], items)         # (X, L)
    qi = gating_mlp(p["gating_qi"], logits)          # (B, X, L)
    gi = qp[:, None, :] * ip[None, :, :] + qi
    gw = gi * (1.0 / (1.0 + np.exp(-gi)))
    e = np.exp(gw - gw.max(-1, keepdims=True))
    pi = e / e.sum(-1, keepdims=True)
    return (pi * logits).sum(-1)


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    rng = np.random.default_rng(0)
    B, X = 5, 7
    q = rng.normal(size=(B, cfg.query_embedding_dim)).astype(np.float32)
    items = rng.normal(size=(X, cfg.item_embedding_dim)).astype(np.float32)
    uids = rng.integers(0, 1000, size=(B,))
    module = MoLSimilarity(cfg)
    params = module.init(
        jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(items)[None],
        user_ids=jnp.asarray(uids),
    )
    return cfg, module, params, q, items, uids


class TestMoLForward:
    def test_matches_naive_shared_corpus(self, setup):
        cfg, module, params, q, items, uids = setup
        scores, aux = module.apply(
            params, jnp.asarray(q), jnp.asarray(items)[None],
            user_ids=jnp.asarray(uids),
        )
        expected = naive_mol(params, cfg, q, items, uids)
        np.testing.assert_allclose(np.asarray(scores), expected, rtol=2e-4, atol=2e-4)
        assert aux == {}

    def test_batched_item_case_matches_shared(self, setup):
        """(B, X, D') batched corpus must agree with per-row shared scoring."""
        cfg, module, params, q, items, uids = setup
        B = q.shape[0]
        rng = np.random.default_rng(1)
        batched = rng.normal(size=(B, 3, cfg.item_embedding_dim)).astype(np.float32)
        scores, _ = module.apply(
            params, jnp.asarray(q), jnp.asarray(batched), user_ids=jnp.asarray(uids)
        )
        for b in range(B):
            row, _ = module.apply(
                params,
                jnp.asarray(q[b : b + 1]),
                jnp.asarray(batched[b : b + 1]),
                user_ids=jnp.asarray(uids[b : b + 1]),
            )
            np.testing.assert_allclose(
                np.asarray(scores[b]), np.asarray(row[0]), rtol=1e-5, atol=1e-5
            )

    def test_score_precomputed_matches_forward(self, setup):
        cfg, module, params, q, items, uids = setup
        full, _ = module.apply(
            params, jnp.asarray(q), jnp.asarray(items)[None],
            user_ids=jnp.asarray(uids),
        )
        tables = module.apply(
            params, jnp.asarray(items), method=MoLSimilarity.build_item_tables
        )
        pre = module.apply(
            params, jnp.asarray(q), tables, user_ids=jnp.asarray(uids),
            method=MoLSimilarity.score_precomputed,
        )
        np.testing.assert_allclose(np.asarray(pre), np.asarray(full), rtol=1e-5, atol=1e-5)

    def test_score_precomputed_gathered_candidates(self, setup):
        cfg, module, params, q, items, uids = setup
        B = q.shape[0]
        full, _ = module.apply(
            params, jnp.asarray(q), jnp.asarray(items)[None],
            user_ids=jnp.asarray(uids),
        )
        tables = module.apply(
            params, jnp.asarray(items), method=MoLSimilarity.build_item_tables
        )
        idx = jnp.asarray(np.stack([np.arange(3), np.arange(2, 5)] * 3)[:B] % items.shape[0])
        pre = module.apply(
            params, jnp.asarray(q), tables, user_ids=jnp.asarray(uids),
            item_indices=idx, method=MoLSimilarity.score_precomputed,
        )
        expected = np.take_along_axis(np.asarray(full), np.asarray(idx), axis=1)
        np.testing.assert_allclose(np.asarray(pre), expected, rtol=1e-5, atol=1e-5)

    def test_train_mode_returns_aux_losses(self, setup):
        cfg, module, params, q, items, uids = setup
        scores, aux = module.apply(
            params, jnp.asarray(q), jnp.asarray(items)[None],
            user_ids=jnp.asarray(uids), train=True,
            rngs={"dropout": jax.random.PRNGKey(7)},
        )
        assert "mi_loss" in aux and "uid_embedding_l2_norm" in aux
        assert np.isfinite(float(aux["mi_loss"]))
        assert float(aux["uid_embedding_l2_norm"]) > 0.0
        assert np.isfinite(np.asarray(scores)).all()

    def test_softmax_dropout_renormalizes(self, setup):
        """With dropout active, combined scores stay bounded (pi sums to 1)."""
        cfg, module, params, q, items, uids = setup
        lo = float(jnp.min(jnp.asarray(naive_mol(params, cfg, q, items, uids))))
        scores, _ = module.apply(
            params, jnp.asarray(q), jnp.asarray(items)[None],
            user_ids=jnp.asarray(uids), train=True,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        # |score| <= max |logit| <= 1/T (l2-normed components).
        assert float(jnp.max(jnp.abs(scores))) <= 1.0 / cfg.temperature + 1e-3


class TestMiLoss:
    def test_uniform_gating_minimizes(self):
        # Uniform per-example gating: -H(util) + H(example) = -log L + log L = 0.
        pi = jnp.full((4, 6, 8), 1.0 / 8.0)
        v = float(load_balancing_mi_loss(pi, eps=0.0))
        assert abs(v) < 1e-5

    def test_collapsed_gating_penalized(self):
        # All mass on one expert: util entropy 0, example entropy 0 -> loss 0;
        # but distinct-per-example one-hot: -H(util)<0 -> loss negative (better).
        one_hot_same = jnp.zeros((4, 1, 8)).at[:, :, 0].set(1.0)
        collapsed = float(load_balancing_mi_loss(one_hot_same, eps=1e-9))
        diverse = jnp.zeros((8, 1, 8))
        diverse = diverse.at[jnp.arange(8), 0, jnp.arange(8)].set(1.0)
        spread = float(load_balancing_mi_loss(diverse, eps=1e-9))
        assert spread < collapsed


class TestConfigSweep:
    @pytest.mark.parametrize("combo", ["glu_silu", "glu_silu_ln", "none"])
    def test_combination_types(self, combo):
        cfg = small_cfg(gating_combination_type=combo)
        module = MoLSimilarity(cfg)
        q = jnp.ones((2, cfg.query_embedding_dim))
        items = jnp.ones((1, 4, cfg.item_embedding_dim))
        uids = jnp.array([1, 2])
        params = module.init(jax.random.PRNGKey(0), q, items, user_ids=uids)
        scores, _ = module.apply(params, q, items, user_ids=uids)
        assert scores.shape == (2, 4)
        assert np.isfinite(np.asarray(scores)).all()

    def test_no_uid_components(self):
        cfg = small_cfg(uid_embedding_hash_sizes=())
        module = MoLSimilarity(cfg)
        q = jnp.ones((2, cfg.query_embedding_dim))
        items = jnp.ones((1, 4, cfg.item_embedding_dim))
        params = module.init(jax.random.PRNGKey(0), q, items)
        scores, _ = module.apply(params, q, items)
        assert scores.shape == (2, 4)

    def test_geglu_item_hidden(self):
        cfg = small_cfg(
            item_hidden_dim=24, item_nonlinearity="geglu",
            query_nonlinearity="geglu",
        )
        module = MoLSimilarity(cfg)
        rng = np.random.default_rng(2)
        q = rng.normal(size=(3, cfg.query_embedding_dim)).astype(np.float32)
        items = rng.normal(size=(5, cfg.item_embedding_dim)).astype(np.float32)
        uids = rng.integers(0, 50, size=(3,))
        module2 = MoLSimilarity(cfg)
        params = module2.init(
            jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(items)[None],
            user_ids=jnp.asarray(uids),
        )
        scores, _ = module2.apply(
            params, jnp.asarray(q), jnp.asarray(items)[None], user_ids=jnp.asarray(uids)
        )
        expected = naive_mol(params, cfg, q, items, uids)
        np.testing.assert_allclose(np.asarray(scores), expected, rtol=2e-4, atol=2e-4)
