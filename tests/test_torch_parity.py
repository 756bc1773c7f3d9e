"""Cross-implementation parity: the reference's OWN torch modules (run on
CPU with fbgemm/gin stubs, see `tests/torch_ref.py`) vs this repo, with
transplanted weights.

Covers the retrieval heart of the reference:
  - MoLSimilarity forward (scores + aux losses) across gating variants
    (`/root/reference/rails/similarities/mol/similarity_fn.py:341-413`)
  - GeGLU / SwiGLU layers (`rails/similarities/layers.py:19-74`)
  - DotProductSimilarity (`rails/similarities/dot_product_similarity_fn.py`)
  - all non-FAISS MoL top-k algorithms
    (`rails/indexing/mol_top_k.py:84-551`)

Real-dataset parity is environmentally blocked (no network egress); this is
the strongest available substitute: the reference's code executes and its
outputs are asserted against ours at float tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import linen as nn

from rails_tpu.core.config import MoLConfig
from rails_tpu.index import top_k as tk
from rails_tpu.similarity.mol import MoLItemTables, MoLSimilarity
from tests.torch_ref import (
    load_reference_rails,
    make_reference_mol,
    mol_params_from_torch,
    t2j,
)

load_reference_rails()

D_Q, D_I, X, B = 32, 32, 200, 6

BASE_CFG = MoLConfig(
    query_embedding_dim=D_Q,
    item_embedding_dim=D_I,
    dot_product_dimension=16,
    query_dot_product_groups=4,       # 3 proj + 1 uid
    item_dot_product_groups=2,
    temperature=0.05,
    dot_product_l2_norm=True,
    query_hidden_dim=64,
    query_dropout_rate=0.0,
    query_nonlinearity="swiglu",
    uid_embedding_hash_sizes=(100,),
    uid_dropout_rate=0.0,
    item_hidden_dim=-1,
    item_dropout_rate=0.0,
    gating_query_fn=True,
    gating_item_fn=True,
    gating_query_hidden_dim=32,
    gating_item_hidden_dim=32,
    gating_qi_hidden_dim=16,
    gating_item_dropout_rate=0.0,
    gating_qi_dropout_rate=0.0,
    gating_combination_type="glu_silu",
    softmax_dropout_rate=0.0,
)


def _rand_inputs(seed=0, x=X, b=B, b_prime=1):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, D_Q)).astype(np.float32)
    items = rng.standard_normal((b_prime, x, D_I)).astype(np.float32)
    uids = rng.integers(0, 5000, (b,)).astype(np.int64)
    return q, items, uids


def _build_pair(cfg, seed=0):
    """(reference torch MoL, repo flax MoL, transplanted params)."""
    torch.manual_seed(seed)
    ref = make_reference_mol(torch, cfg, D_Q, D_I)
    ref.eval()
    model = MoLSimilarity(cfg)
    params = {"params": mol_params_from_torch(ref, cfg)}
    return ref, model, params


def _assert_tree_shapes_match(model, params, cfg):
    """The transplanted tree must be exactly the tree flax would init —
    catches silent param-naming drift."""
    q, items, uids = _rand_inputs()
    init = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(q), jnp.asarray(items), user_ids=jnp.asarray(uids),
        train=True,
    )
    flat_a = jax.tree_util.tree_leaves_with_path(init)
    flat_b = jax.tree_util.tree_leaves_with_path(params)
    paths_a = {jax.tree_util.keystr(p): v.shape for p, v in flat_a}
    paths_b = {jax.tree_util.keystr(p): np.shape(v) for p, v in flat_b}
    assert paths_a == paths_b


class TestMoLForward:
    def test_param_tree_matches_init(self):
        ref, model, params = _build_pair(BASE_CFG)
        _assert_tree_shapes_match(model, params, BASE_CFG)

    @pytest.mark.parametrize("b_prime", [1, B])
    def test_eval_scores_match(self, b_prime):
        ref, model, params = _build_pair(BASE_CFG)
        q, items, uids = _rand_inputs(seed=1, b_prime=b_prime)
        with torch.no_grad():
            ref_scores, _ = ref(
                torch.from_numpy(q), torch.from_numpy(items),
                user_ids=torch.from_numpy(uids),
            )
        my_scores, _ = model.apply(
            params, jnp.asarray(q), jnp.asarray(items),
            user_ids=jnp.asarray(uids), train=False,
        )
        np.testing.assert_allclose(
            np.asarray(my_scores), t2j(ref_scores), rtol=2e-5, atol=5e-4
        )

    def test_train_aux_losses_match(self):
        """All dropouts zero -> train mode is deterministic; mi_loss and the
        uid l2 norm must agree (`similarity_fn.py:49-63`,
        `query_embeddings_fns.py:208-215`)."""
        ref, model, params = _build_pair(BASE_CFG)
        ref.train()
        q, items, uids = _rand_inputs(seed=2)
        ref_scores, ref_aux = ref(
            torch.from_numpy(q), torch.from_numpy(items),
            user_ids=torch.from_numpy(uids),
        )
        my_scores, my_aux = model.apply(
            params, jnp.asarray(q), jnp.asarray(items),
            user_ids=jnp.asarray(uids), train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        np.testing.assert_allclose(
            np.asarray(my_scores), t2j(ref_scores), rtol=2e-5, atol=5e-4
        )
        assert set(my_aux) == set(ref_aux) == {"mi_loss", "uid_embedding_l2_norm"}
        for key in ref_aux:
            np.testing.assert_allclose(
                float(my_aux[key]), float(ref_aux[key]), rtol=1e-4, atol=1e-5,
                err_msg=key,
            )

    def test_geglu_hidden_item_mlp_no_uid(self):
        """geglu nonlinearity + item hidden MLP + no uid components (the
        amzn-books shape, `configs/*books*.gin`)."""
        cfg = BASE_CFG.replace(
            query_nonlinearity="geglu",
            item_nonlinearity="geglu",
            item_hidden_dim=48,
            uid_embedding_hash_sizes=(),
            query_dot_product_groups=4,
        )
        ref, model, params = _build_pair(cfg, seed=3)
        q, items, _ = _rand_inputs(seed=3)
        with torch.no_grad():
            ref_scores, _ = ref(torch.from_numpy(q), torch.from_numpy(items))
        my_scores, _ = model.apply(
            params, jnp.asarray(q), jnp.asarray(items), train=False
        )
        np.testing.assert_allclose(
            np.asarray(my_scores), t2j(ref_scores), rtol=2e-5, atol=5e-4
        )

    def test_combination_none_qi_only(self):
        """combination_type="none" with only the qi partial active. (The
        reference's "none" branch in-place-adds the (B, X, L) qi partial into
        the (B, 1, L)/(1, X, L) query/item partials and crashes on the
        broadcast (`similarity_fn.py:188-196`) whenever one of those is
        enabled, so qi-only is the only runnable "none" configuration; the
        repo's out-of-place sum generalizes it.)"""
        cfg = BASE_CFG.replace(
            gating_combination_type="none",
            gating_item_fn=False,
            gating_query_fn=False,
        )
        ref, model, params = _build_pair(cfg, seed=4)
        q, items, uids = _rand_inputs(seed=4)
        with torch.no_grad():
            ref_scores, _ = ref(
                torch.from_numpy(q), torch.from_numpy(items),
                user_ids=torch.from_numpy(uids),
            )
        my_scores, _ = model.apply(
            params, jnp.asarray(q), jnp.asarray(items),
            user_ids=jnp.asarray(uids), train=False,
        )
        np.testing.assert_allclose(
            np.asarray(my_scores), t2j(ref_scores), rtol=2e-5, atol=5e-4
        )

    def test_softmax_dropout_renormalizes_like_reference(self):
        """With softmax dropout active the realizations differ (different
        RNGs), but both must keep sum(pi) == 1 after renormalization
        (`similarity_fn.py:42-46`) — compare the mean score magnitude."""
        cfg = BASE_CFG.replace(softmax_dropout_rate=0.5)
        ref, model, params = _build_pair(cfg, seed=5)
        ref.train()
        q, items, uids = _rand_inputs(seed=5)
        ref_scores, _ = ref(
            torch.from_numpy(q), torch.from_numpy(items),
            user_ids=torch.from_numpy(uids),
        )
        my_scores, _ = model.apply(
            params, jnp.asarray(q), jnp.asarray(items),
            user_ids=jnp.asarray(uids), train=True,
            rngs={"dropout": jax.random.PRNGKey(7)},
        )
        # Dropped-and-renormalized mixtures stay in the convex hull of the
        # component logits; means should agree loosely.
        assert abs(float(my_scores.mean()) - float(ref_scores.mean())) < 0.5


class TestLayersAndDotProduct:
    @pytest.mark.parametrize("kind", ["geglu", "swiglu"])
    def test_glu_matches(self, kind):
        from rails.similarities.layers import GeGLU, SwiGLU

        from rails_tpu.similarity.layers import GLU

        torch.manual_seed(11)
        ref = (GeGLU if kind == "geglu" else SwiGLU)(
            in_features=24, out_features=40
        )
        x = np.random.default_rng(11).standard_normal((9, 24)).astype(np.float32)
        with torch.no_grad():
            ref_y = ref(torch.from_numpy(x))
        glu = GLU(features=40, activation="gelu" if kind == "geglu" else "silu")
        params = {"params": {"w": {"kernel": t2j(ref._w), "bias": t2j(ref._b)[0]}}}
        my_y = glu.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(my_y), t2j(ref_y), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("b_prime", [1, B])
    def test_dot_product_matches(self, b_prime):
        from rails.similarities.dot_product_similarity_fn import (
            DotProductSimilarity as RefDP,
        )

        from rails_tpu.similarity.dot_product import DotProductSimilarity

        ref = RefDP()
        q, items, _ = _rand_inputs(seed=12, b_prime=b_prime)
        with torch.no_grad():
            ref_scores, _ = ref(torch.from_numpy(q), torch.from_numpy(items))
        my = DotProductSimilarity()
        my_scores, _ = my.apply({"params": {}}, jnp.asarray(q), jnp.asarray(items))
        np.testing.assert_allclose(
            np.asarray(my_scores), t2j(ref_scores), rtol=1e-5, atol=1e-4
        )


# ------------------------------------------------------------------ #
# Top-k algorithm parity.
# ------------------------------------------------------------------ #


class _MoLWrapper(nn.Module):
    """Minimal stand-in for the encoder's similarity delegation
    (`models/encoder.py:266-292`) so the index functions can drive a bare
    MoLSimilarity."""

    cfg: MoLConfig

    def setup(self):
        self.similarity = MoLSimilarity(self.cfg, name="mol")

    def build_item_tables(self, item_embeddings):
        return self.similarity.build_item_tables(item_embeddings)

    def score_precomputed(self, q, tables, user_ids=None, item_indices=None):
        return self.similarity.score_precomputed(
            q, tables, user_ids=user_ids, item_indices=item_indices
        )

    def score_gathered(self, q, component_embeddings, gating_partial,
                       user_ids=None):
        return self.similarity.score_gathered(
            q, component_embeddings, gating_partial, user_ids=user_ids
        )

    def query_components(self, q, user_ids=None):
        comps, _ = self.similarity.query_components(
            q, user_ids=user_ids, train=False
        )
        return comps

    def query_gating_partial(self, q):
        return self.similarity.query_gating_partial(q)


@pytest.fixture(scope="module")
def topk_setup():
    import rails.indexing.mol_top_k as ref_tk

    # The reference keeps prefilter tables in bf16 by default
    # (`mol_top_k.py:37`); pin fp32 on both sides so candidate sets are
    # bitwise comparable.
    ref_tk.MoLTopKModule.__init__.__defaults__ = (torch.float32,)

    cfg = BASE_CFG
    torch.manual_seed(21)
    ref_mol = make_reference_mol(torch, cfg, D_Q, D_I)
    ref_mol.eval()

    wrapper = _MoLWrapper(cfg)
    params = {"params": {"mol": mol_params_from_torch(ref_mol, cfg)}}

    q, items, uids = _rand_inputs(seed=21)
    item_ids = np.arange(1, X + 1, dtype=np.int32)
    state = tk.build_mol_topk_state(
        wrapper, params, jnp.asarray(item_ids), jnp.asarray(items[0]),
        table_dtype=jnp.float32,
    )
    return ref_tk, cfg, ref_mol, wrapper, params, state, q, items, uids, item_ids


def _assert_topk_match(my_scores, my_ids, ref_scores, ref_ids, tie_tol=1e-3):
    my_scores, my_ids = np.asarray(my_scores), np.asarray(my_ids)
    ref_scores, ref_ids = np.asarray(ref_scores), np.asarray(ref_ids)
    np.testing.assert_allclose(my_scores, ref_scores, rtol=1e-4, atol=2e-3)
    mism = my_ids != ref_ids
    for b, j in zip(*np.nonzero(mism)):
        near = np.abs(ref_scores[b] - ref_scores[b, j]) < tie_tol
        assert near.sum() > 1, f"id mismatch at ({b},{j}) without a score tie"


class TestTopKParity:
    K = 10

    def test_brute_force(self, topk_setup):
        ref_tk, cfg, ref_mol, wrapper, params, state, q, items, uids, ids = topk_setup
        module = ref_tk.MoLBruteForceTopK(
            mol_module=ref_mol,
            item_embeddings=torch.from_numpy(items),
            item_ids=torch.from_numpy(ids.astype(np.int64))[None],
        )
        with torch.no_grad():
            ref_scores, ref_ids = module(
                torch.from_numpy(q), k=self.K,
                user_ids=torch.from_numpy(uids),
            )
        res = tk.mol_brute_force_top_k(
            wrapper, params, state, jnp.asarray(q), self.K,
            user_ids=jnp.asarray(uids),
        )
        _assert_topk_match(res.scores, res.ids, t2j(ref_scores), t2j(ref_ids))

    def test_naive(self, topk_setup):
        ref_tk, cfg, ref_mol, wrapper, params, state, q, items, uids, ids = topk_setup
        k_per_group = 20
        module = ref_tk.MoLNaiveTopK(
            mol_module=ref_mol,
            item_embeddings=torch.from_numpy(items),
            item_ids=torch.from_numpy(ids.astype(np.int64))[None],
            k_per_group=k_per_group,
        )
        with torch.no_grad():
            # The reference returns the full candidate union
            # (`mol_top_k.py:260,286`); truncate to K.
            ref_scores, ref_ids = module(
                torch.from_numpy(q), k=self.K,
                user_ids=torch.from_numpy(uids),
            )
        res = tk.mol_naive_top_k(
            wrapper, params, state, jnp.asarray(q), self.K,
            k_per_group=k_per_group, user_ids=jnp.asarray(uids),
        )
        _assert_topk_match(
            res.scores, res.ids,
            t2j(ref_scores)[:, : self.K], t2j(ref_ids)[:, : self.K],
        )

    def test_avg(self, topk_setup):
        ref_tk, cfg, ref_mol, wrapper, params, state, q, items, uids, ids = topk_setup
        avg_top_k = 50
        module = ref_tk.MoLAvgTopK(
            mol_module=ref_mol,
            item_embeddings=torch.from_numpy(items),
            item_ids=torch.from_numpy(ids.astype(np.int64))[None],
            avg_top_k=avg_top_k,
        )
        with torch.no_grad():
            ref_scores, ref_ids = module(
                torch.from_numpy(q), k=self.K,
                user_ids=torch.from_numpy(uids),
            )
        res = tk.mol_avg_top_k(
            wrapper, params, state, jnp.asarray(q), self.K,
            avg_top_k=avg_top_k, user_ids=jnp.asarray(uids),
        )
        _assert_topk_match(res.scores, res.ids, t2j(ref_scores), t2j(ref_ids))

    def test_comb(self, topk_setup):
        ref_tk, cfg, ref_mol, wrapper, params, state, q, items, uids, ids = topk_setup
        avg_top_k, k_per_group = 40, 10
        module = ref_tk.MoLCombTopK(
            mol_module=ref_mol,
            item_embeddings=torch.from_numpy(items),
            item_ids=torch.from_numpy(ids.astype(np.int64))[None],
            avg_top_k=avg_top_k,
            k_per_group=k_per_group,
        )
        with torch.no_grad():
            ref_scores, ref_ids = module(
                torch.from_numpy(q), k=self.K,
                user_ids=torch.from_numpy(uids),
            )
        res = tk.mol_comb_top_k(
            wrapper, params, state, jnp.asarray(q), self.K,
            avg_top_k=avg_top_k, k_per_group=k_per_group,
            user_ids=jnp.asarray(uids),
        )
        _assert_topk_match(
            res.scores, res.ids,
            t2j(ref_scores)[:, : self.K], t2j(ref_ids)[:, : self.K],
        )
