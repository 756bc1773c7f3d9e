"""fused_adamw == optax.adamw + apply_updates, multi-step, incl. schedule."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from rails_tpu.train.fused_adamw import fused_adamw


def _tree(key):
    ks = jax.random.split(key, 4)
    return {
        "emb": jax.random.normal(ks[0], (300, 64)),      # hits the fused path
        "w": jax.random.normal(ks[1], (16, 8)),
        "b": jax.random.normal(ks[2], (8,)),
        "nested": {"k": jax.random.normal(ks[3], (4, 4))},
    }


def _run(opt, params, grads_seq):
    state = opt.init(params)
    for g in grads_seq:
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return params, state


def test_matches_optax_adamw_multistep():
    params = _tree(jax.random.PRNGKey(0))
    grads_seq = [
        jax.tree_util.tree_map(
            lambda p, i=i: 0.01 * jax.random.normal(
                jax.random.PRNGKey(100 + i), p.shape
            ),
            params,
        )
        for i in range(5)
    ]
    ref_opt = optax.adamw(1e-3, b1=0.9, b2=0.98, eps=1e-8, weight_decay=1e-3)
    fus_opt = fused_adamw(
        1e-3, b1=0.9, b2=0.98, eps=1e-8, weight_decay=1e-3,
        min_fused_elements=300 * 64,                     # force emb through pallas
    )
    p_ref, _ = _run(ref_opt, params, grads_seq)
    p_fus, st = _run(fus_opt, params, grads_seq)
    for a, b in zip(jax.tree_util.tree_leaves(p_fus),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )
    assert int(st.count) == 5


def test_matches_optax_with_warmup_schedule():
    params = _tree(jax.random.PRNGKey(1))
    grads_seq = [
        jax.tree_util.tree_map(
            lambda p, i=i: 0.05 * jax.random.normal(
                jax.random.PRNGKey(200 + i), p.shape
            ),
            params,
        )
        for i in range(4)
    ]
    sched = optax.linear_schedule(1e-4, 1e-3, transition_steps=3)
    ref_opt = optax.adamw(sched, b1=0.9, b2=0.98, eps=1e-8, weight_decay=1e-3)
    fus_opt = fused_adamw(
        sched, b1=0.9, b2=0.98, eps=1e-8, weight_decay=1e-3,
        min_fused_elements=300 * 64,
    )
    p_ref, _ = _run(ref_opt, params, grads_seq)
    p_fus, _ = _run(fus_opt, params, grads_seq)
    for a, b in zip(jax.tree_util.tree_leaves(p_fus),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_jit_and_nonpadded_rows():
    """Odd row counts exercise the pad/slice path under jit."""
    params = {"emb": jax.random.normal(jax.random.PRNGKey(2), (1037, 128))}
    g = {"emb": 0.01 * jax.random.normal(jax.random.PRNGKey(3), (1037, 128))}
    ref_opt = optax.adamw(1e-3, b1=0.9, b2=0.98, eps=1e-8, weight_decay=1e-3)
    fus_opt = fused_adamw(
        1e-3, b1=0.9, b2=0.98, eps=1e-8, weight_decay=1e-3,
        min_fused_elements=1037 * 128, block_rows=256,
    )

    def make_step(opt):
        @jax.jit
        def step(params, state, g):
            updates, state = opt.update(g, state, params)
            return optax.apply_updates(params, updates), state
        return step

    p_ref, _ = make_step(ref_opt)(params, ref_opt.init(params), g)
    p_fus, _ = make_step(fus_opt)(params, fus_opt.init(params), g)
    np.testing.assert_allclose(
        np.asarray(p_fus["emb"]), np.asarray(p_ref["emb"]),
        rtol=1e-6, atol=1e-6,
    )
