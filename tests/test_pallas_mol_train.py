"""Fused MoL training-loss kernel (custom VJP) vs XLA replicas.

The kernel's dropout is an in-kernel hash stream; `hash_keep_global`
exposes the exact bits so the XLA replica here consumes bit-identical
masks — forward AND gradients must then match at fp32 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rails_tpu.ops.pallas.mol_loss_train import (
    _PI_SALT,
    _QI_SALT,
    hash_keep_global,
    make_fused_mol_loss,
)
from rails_tpu.ops.pallas.mol_scoring import (
    MoLKernelWeights,
    _sigmoid_tanh,
    m_major_perm,
)

P_Q, P_X, D_P, H = 4, 2, 16, 24
L = P_Q * P_X
TEMP = 0.05
EPS = 1e-6
BLOCK_Q = 8


def _rand_inputs(key, m, r, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    q_comp = jax.random.normal(ks[0], (m, P_Q, D_P), dtype)
    qp = jax.random.normal(ks[1], (m, L), dtype)
    i_comp = jax.random.normal(ks[2], (r, P_X, D_P), dtype)
    ip = jax.random.normal(ks[3], (r, L), dtype)
    w = MoLKernelWeights(
        w1=jax.random.normal(ks[4], (L, H), dtype) * 0.3,
        b1=jax.random.normal(ks[5], (1, H), dtype) * 0.1,
        w2=jax.random.normal(ks[6], (H, L), dtype) * 0.3,
        b2=jax.random.normal(ks[7], (1, L), dtype) * 0.1,
    )
    return q_comp, qp, i_comp, ip, w


def _xla_replica(q_comp, qp, i_comp, ip, w, seed, pi_rate, qi_rate):
    """Same math/masks as the kernel, in plain jnp (standard layout)."""
    m, _, _ = q_comp.shape
    r = i_comp.shape[0]
    g = min(BLOCK_Q, m)
    pad_m = (-m) % g
    pad_r = (-r) % 128
    mp, rp = m + pad_m, r + pad_r
    q_p = jnp.pad(q_comp, ((0, pad_m), (0, 0), (0, 0)))
    qp_p = jnp.pad(qp, ((0, pad_m), (0, 0)))
    i_p = jnp.pad(i_comp, ((0, pad_r), (0, 0), (0, 0)))
    ip_p = jnp.pad(ip, ((0, pad_r), (0, 0)))

    # (L_std, M, R) component logits; l_std = n * P_X + mi.
    t = jnp.einsum("mnd,xid->nimx", q_p, i_p).reshape(L, mp, rp) / TEMP
    # Kernel masks are generated in m-major order; map to std order.
    perm = m_major_perm(P_Q, P_X)           # perm[k] = std index
    inv = np.argsort(perm)
    if qi_rate > 0.0:
        qi_mask = hash_keep_global(seed, _QI_SALT, L, mp, rp, qi_rate)[inv]
        t_in = t * qi_mask
    else:
        t_in = t
    z = jnp.einsum("lh,lmx->hmx", w.w1, t_in) + w.b1[0][:, None, None]
    h_silu = z * _sigmoid_tanh(z)
    qi = jnp.einsum("hl,hmx->lmx", w.w2, h_silu) + w.b2[0][:, None, None]
    gi = qp_p.T[:, :, None] * ip_p.T[:, None, :] + qi
    gw = gi * _sigmoid_tanh(gi)
    p = jax.nn.softmax(gw, axis=0)
    if pi_rate > 0.0:
        pi_mask = hash_keep_global(seed, _PI_SALT, L, mp, rp, pi_rate)[inv]
        q_w = p * pi_mask
        s = jnp.maximum(jnp.sum(q_w, axis=0), EPS)
    else:
        q_w = p
        s = jnp.ones((mp, rp), jnp.float32)
    out = jnp.sum(q_w * t, axis=0) / s
    return out[:m, :r]


@pytest.mark.parametrize(
    "pi_rate,qi_rate,m,r",
    [
        (0.0, 0.0, 24, 40),
        (0.2, 0.0, 24, 40),
        (0.2, 0.1, 20, 130),    # padded M and R paths
        (0.5, 0.3, 8, 128),
    ],
)
def test_fused_matches_replica_fwd_and_grads(pi_rate, qi_rate, m, r):
    key = jax.random.PRNGKey(0)
    q_comp, qp, i_comp, ip, w = _rand_inputs(key, m, r)
    seed = jnp.int32(12345)

    fused = make_fused_mol_loss(
        p_q=P_Q, p_x=P_X, temperature=TEMP,
        softmax_dropout_rate=pi_rate, qi_dropout_rate=qi_rate, eps=EPS,
        block_q=BLOCK_Q,
    )
    out_k = fused(q_comp, qp, i_comp, ip, w, seed)
    out_r = _xla_replica(q_comp, qp, i_comp, ip, w, seed, pi_rate, qi_rate)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_r), rtol=2e-4, atol=2e-4
    )

    cot = jax.random.normal(jax.random.PRNGKey(7), out_k.shape)

    def loss_k(q_comp, qp, i_comp, ip, w):
        return jnp.sum(fused(q_comp, qp, i_comp, ip, w, seed) * cot)

    def loss_r(q_comp, qp, i_comp, ip, w):
        return jnp.sum(
            _xla_replica(q_comp, qp, i_comp, ip, w, seed, pi_rate, qi_rate)
            * cot
        )

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(q_comp, qp, i_comp, ip, w)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(q_comp, qp, i_comp, ip, w)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        a, b = np.asarray(a), np.asarray(b)
        # Positions where the softmax-dropout renorm clamps to eps amplify
        # fp noise by 1/eps (possible at this test's tiny L=8; impossible at
        # the real L=32/64) — allow <=0.1% stragglers within a loose bound.
        err = np.abs(a - b) / (3e-3 + 3e-3 * np.abs(b))
        assert np.mean(err > 1.0) <= 1e-3, (err.max(), np.mean(err > 1.0))
        scale = max(1.0, float(np.max(np.abs(b))))
        assert np.max(np.abs(a - b)) < 0.05 * scale


def test_books_geometry_matches_replica():
    """The published Books MoL geometry (P_Q=8, P_X=8, d_P=32, L=64, H=128,
    R=512) through the kernel at a small M — guards the lane/sublane layout
    at the real shapes, not just the toy ones above."""
    p_q, p_x, d_p, h, r, m = 8, 8, 32, 128, 512, 16
    l = p_q * p_x
    ks = jax.random.split(jax.random.PRNGKey(11), 8)
    q_comp = jax.random.normal(ks[0], (m, p_q, d_p))
    qp = jax.random.normal(ks[1], (m, l))
    i_comp = jax.random.normal(ks[2], (r, p_x, d_p))
    ip = jax.random.normal(ks[3], (r, l))
    # l2-normalize components as every published config does — keeps the
    # kernel-vs-replica delta at accumulation-order noise rather than
    # temperature-amplified magnitudes.
    q_comp = q_comp / jnp.linalg.norm(q_comp, axis=-1, keepdims=True)
    i_comp = i_comp / jnp.linalg.norm(i_comp, axis=-1, keepdims=True)
    w = MoLKernelWeights(
        w1=jax.random.normal(ks[4], (l, h)) * 0.2,
        b1=jax.random.normal(ks[5], (1, h)) * 0.1,
        w2=jax.random.normal(ks[6], (h, l)) * 0.2,
        b2=jax.random.normal(ks[7], (1, l)) * 0.1,
    )
    seed = jnp.int32(7)
    fused = make_fused_mol_loss(
        p_q=p_q, p_x=p_x, temperature=0.05,
        softmax_dropout_rate=0.2, qi_dropout_rate=0.0, eps=1e-6, block_q=8,
    )
    out_k = np.asarray(fused(q_comp, qp, i_comp, ip, w, seed))

    perm = m_major_perm(p_q, p_x)
    inv = np.argsort(perm)
    from rails_tpu.ops.pallas.mol_loss_train import _PI_SALT as PI
    t = jnp.einsum("mnd,xid->nimx", q_comp, i_comp).reshape(l, m, r) / 0.05
    z = jnp.einsum("lh,lmx->hmx", w.w1, t) + w.b1[0][:, None, None]
    qi = jnp.einsum(
        "hl,hmx->lmx", w.w2, z * _sigmoid_tanh(z)
    ) + w.b2[0][:, None, None]
    gi = qp.T[:, :, None] * ip.T[:, None, :] + qi
    gw = gi * _sigmoid_tanh(gi)
    p = jax.nn.softmax(gw, axis=0)
    mask = hash_keep_global(seed, PI, l, m, r, 0.2)[inv]
    q_w = p * mask
    s = jnp.maximum(jnp.sum(q_w, axis=0), 1e-6)
    out_r = np.asarray(jnp.sum(q_w * t, axis=0) / s)
    np.testing.assert_allclose(out_k, out_r, rtol=3e-4, atol=3e-4)


def test_fused_bf16_runs_and_tracks_f32():
    key = jax.random.PRNGKey(3)
    q_comp, qp, i_comp, ip, w = _rand_inputs(key, 16, 128)
    # Real configs l2-normalize components (`dot_product_l2_norm=True`), so
    # hold the bf16-vs-f32 comparison at realistic logit magnitudes.
    q_comp = q_comp / jnp.linalg.norm(q_comp, axis=-1, keepdims=True)
    i_comp = i_comp / jnp.linalg.norm(i_comp, axis=-1, keepdims=True)
    seed = jnp.int32(99)
    fused = make_fused_mol_loss(
        p_q=P_Q, p_x=P_X, temperature=TEMP,
        softmax_dropout_rate=0.2, qi_dropout_rate=0.0, eps=EPS,
        block_q=BLOCK_Q,
    )
    out32 = np.asarray(fused(q_comp, qp, i_comp, ip, w, seed))
    bf = jnp.bfloat16
    out16 = np.asarray(fused(
        q_comp.astype(bf), qp.astype(bf), i_comp.astype(bf), ip.astype(bf),
        MoLKernelWeights(*(x.astype(bf) for x in w)), seed,
    )).astype(np.float32)
    assert np.isfinite(out16).all()
    spread = float(np.std(out32))
    err = np.abs(out16 - out32)
    assert float(np.quantile(err, 0.99)) < 0.1 * spread
    assert float(np.max(err)) < 0.5 * spread


def _small_cfg(fused: bool):
    from rails_tpu.core.config import get_experiment_config

    cfg = get_experiment_config("synthetic-small")
    cfg = cfg.replace(
        mol=cfg.mol.replace(
            softmax_dropout_rate=0.0,
            gating_qi_dropout_rate=0.0,
            query_dropout_rate=0.0,
            item_dropout_rate=0.0,
            uid_dropout_rate=0.0,
        ),
        train=cfg.train.replace(
            local_batch_size=4,
            num_negatives=16,
            shared_negatives=True,
            fused_mol_loss=fused,
        ),
    )
    return cfg


def _loss_and_grads(cfg, seed=0):
    from rails_tpu.data.datasets import (
        SequenceDataset,
        generate_synthetic_sequences,
    )
    from rails_tpu.losses.sampled_softmax import sampled_softmax_loss
    from rails_tpu.train.loop import create_train_state

    num_items = cfg.data.synthetic_num_items
    seqs = generate_synthetic_sequences(
        num_users=16, num_items=num_items, max_len=16, seed=seed
    )
    ds = SequenceDataset(seqs, cfg.data.max_sequence_length, ignore_last_n=1)
    batch = next(ds.batches(
        batch_size=cfg.train.local_batch_size,
        max_output_length=cfg.train.gr_output_length + 1, shuffle=False,
    ))
    all_ids = np.arange(1, num_items + 1, dtype=np.int32)
    model, state, _, sampler = create_train_state(
        cfg, num_items, all_ids, batch
    )
    rngs = {"sampler": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(6)}

    def loss_fn(params):
        loss, _ = model.apply(
            params, batch.features, sampler,
            cfg.train.num_negatives, cfg.train.temperature, True,
            False, shared_negatives=True,
            method=sampled_softmax_loss, rngs=rngs,
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return float(loss), grads


def test_loss_wiring_matches_xla_at_zero_dropout():
    """With every dropout at 0 the hash stream is inert: the fused loss must
    equal the XLA loss (same rngs) and the parameter grads must match."""
    l_x, g_x = _loss_and_grads(_small_cfg(fused=False))
    l_f, g_f = _loss_and_grads(_small_cfg(fused=True))
    assert abs(l_x - l_f) < 2e-4 * max(1.0, abs(l_x))
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_f))
    checked = 0
    for path, leaf in flat_x:
        other = flat_f[path]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(other), rtol=2e-3, atol=2e-3,
            err_msg=str(path),
        )
        checked += 1
    assert checked > 10


def test_fused_flag_falls_back_for_unsupported_configs():
    """fused_mol_loss=True with an in-batch sampler (unsupported) must fall
    back to the XLA path and produce the identical loss."""
    cfg_base = _small_cfg(fused=False).replace()
    cfg_base = cfg_base.replace(
        train=cfg_base.train.replace(sampling_strategy="in-batch")
    )
    cfg_fused = cfg_base.replace(
        train=cfg_base.train.replace(fused_mol_loss=True)
    )
    l_x, _ = _loss_and_grads(cfg_base)
    l_f, _ = _loss_and_grads(cfg_fused)
    assert l_x == l_f


def test_loss_wiring_dropout_train_step_runs():
    from rails_tpu.core.config import get_experiment_config
    from rails_tpu.data.datasets import (
        SequenceDataset,
        generate_synthetic_sequences,
    )
    from rails_tpu.train.loop import create_train_state

    cfg = get_experiment_config("synthetic-small")
    cfg = cfg.replace(
        train=cfg.train.replace(
            local_batch_size=4, num_negatives=16,
            shared_negatives=True, fused_mol_loss=True,
        ),
    )
    num_items = cfg.data.synthetic_num_items
    seqs = generate_synthetic_sequences(
        num_users=16, num_items=num_items, max_len=16, seed=1
    )
    ds = SequenceDataset(seqs, cfg.data.max_sequence_length, ignore_last_n=1)
    batch = next(ds.batches(
        batch_size=4, max_output_length=cfg.train.gr_output_length + 1,
        shuffle=False,
    ))
    all_ids = np.arange(1, num_items + 1, dtype=np.int32)
    _, state, train_step, _ = create_train_state(cfg, num_items, all_ids, batch)
    state2, metrics = train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()
