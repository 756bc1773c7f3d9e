"""Fused-MoL-scorer cost decomposition probe (measurement harness).

VERDICT r4 #6: the gating/combine chain (~20 ms per M items at B=32) is the
binding resource for exact MoL serving at scale and had never been probed.
This harness times truncated variants of the fused scoring kernel
(`ops/pallas/mol_scoring._kernel`, forked below with a `mode` knob) on a
multi-M synthetic corpus, attributing ms/M-items to each stage:

  full       logits matmul + qi MLP + gating combine + (B, X) write
  nosilu     combine keeps softmax but gw := gi (drops L tanh / item)
  noexp      combine keeps silu but e := gw    (drops L exp / item)
  nomlp      qi := bias only (drops BOTH MLP matmuls + silu(h))
  nocombine  out := mean_l logits (drops the whole gating/combine chain)
  write-only out := first logit row (logits matmul + write; floor)

plus `hierarchical select` timed separately on a precomputed (B, X) score
row — together these give the measured decomposition VERDICT #6 asks for:
(a) what the qi-MLP matmuls cost as laid out today, (b) the ceiling of the
emit-candidates-from-VMEM restructure (= select + score-row write, the
terms it could remove).

Timing: R iterations scanned inside ONE jit with the query perturbed by a
carry derived from the previous iteration's output (true serialization;
per-call timings cannot resolve device work through the ~25 ms-RTT tunnel).

Usage (real chip):  python -m rails_tpu.cli.mol_probe --num-items 2000000
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def _variant_kernel(
    q_ref, qp_ref, item_ref, ip_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    out_ref, logits_ref,
    *, p_q, p_x, inv_temperature, mlp_dtype, mode,
):
    import jax
    import jax.numpy as jnp

    from rails_tpu.ops.pallas.mol_scoring import _sigmoid_tanh

    b = q_ref.shape[1]
    d_p = q_ref.shape[2]
    tx = item_ref.shape[2]
    l = p_q * p_x

    q_flat = q_ref[:].reshape(p_q * b, d_p)
    for m in range(p_x):
        raw = jnp.dot(q_flat, item_ref[m], preferred_element_type=jnp.float32)
        logits_ref[m * p_q:(m + 1) * p_q] = (
            raw * inv_temperature).reshape(p_q, b, tx)
    logits = logits_ref[:].reshape(l, b * tx)

    if mode == "writeonly":
        out_ref[:] = logits.reshape(l, b, tx)[0]
        return
    if mode == "nocombine":
        out_ref[:] = jnp.mean(logits.reshape(l, b, tx), axis=0)
        return

    if mode == "nomlp":
        qi = jnp.broadcast_to(b2_ref[0][:, None], (l, b * tx)).reshape(
            l, b, tx)
    else:
        h = jax.lax.dot_general(
            w1_ref[:].astype(mlp_dtype), logits.astype(mlp_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = h + b1_ref[0][:, None]
        h = h * _sigmoid_tanh(h)
        qi = jax.lax.dot_general(
            w2_ref[:].astype(mlp_dtype), h.astype(mlp_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qi = (qi + b2_ref[0][:, None]).reshape(l, b, tx)

    gi = (qp_ref[:].astype(jnp.float32).T[:, :, None]
          * ip_ref[:].astype(jnp.float32)[:, None, :] + qi)
    gw = gi if mode == "nosilu" else gi * _sigmoid_tanh(gi)
    if mode == "noexp":
        e = gw
    else:
        e = jnp.exp(gw - jnp.max(gw, axis=0, keepdims=True))
    s1 = jnp.sum(e * logits.reshape(l, b, tx), axis=0)
    s0 = jnp.sum(e, axis=0)
    out_ref[:] = s1 / s0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-items", type=int, default=2_000_000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--runs", type=int, default=8)
    p.add_argument(
        "--modes", default="full,nosilu,noexp,nomlp,nocombine,writeonly")
    p.add_argument("--k", type=int, default=200)
    p.add_argument("--output-json", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rails_tpu.index import top_k as tk

    # ML-20M MoL geometry (core/config.py): 8x4x128, H=128, L=32.
    p_q, p_x, d_p, hdim = 8, 4, 128, 128
    l = p_q * p_x
    b, x = args.batch_size, args.num_items
    block_x, block_b = 256, 32
    x_pad = ((x + block_x - 1) // block_x) * block_x

    rng = np.random.default_rng(0)
    item = jnp.asarray(
        rng.standard_normal((p_x, d_p, x_pad)) * 0.1, jnp.bfloat16)
    ip = jnp.asarray(rng.standard_normal((l, x_pad)) * 0.1, jnp.bfloat16)
    q0 = jnp.asarray(rng.standard_normal((p_q, b, d_p)) * 0.1, jnp.float32)
    qp = jnp.asarray(rng.standard_normal((b, l)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((l, hdim)) * 0.1, jnp.float32)
    b1 = jnp.zeros((1, hdim), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hdim, l)) * 0.1, jnp.float32)
    b2 = jnp.zeros((1, l), jnp.float32)

    def make_scorer(mode):
        kernel = functools.partial(
            _variant_kernel, p_q=p_q, p_x=p_x, inv_temperature=20.0,
            mlp_dtype=jnp.bfloat16, mode=mode)
        in_specs = [
            pl.BlockSpec((p_q, block_b, d_p), lambda j, i: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, l), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_x, d_p, block_x), lambda j, i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l, block_x), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l, hdim), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, l), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

        def score(q, item, ip):
            return pl.pallas_call(
                kernel,
                grid=(b // block_b, x_pad // block_x),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (block_b, block_x), lambda j, i: (j, i),
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((b, x_pad), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((l, block_b, block_x), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel")),
            )(q.astype(jnp.bfloat16), qp, item, ip, w1, b1, w2, b2)

        return score

    def timed(fn, *fargs):
        jfn = jax.jit(fn)            # ONE wrapper: compile exactly once
        t0 = time.perf_counter()
        out = np.asarray(jfn(*fargs, jnp.int32(0)))  # compile+warm
        print(f"  compiled+warm in {time.perf_counter() - t0:.1f} s",
              flush=True)
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(jfn(*fargs, jnp.int32(i + 1)))
            best = min(best, time.perf_counter() - t0)
        return best / args.runs * 1e3, out

    results = {}
    for mode in args.modes.split(","):
        print(f"mode={mode}: compiling...", flush=True)
        score = make_scorer(mode)

        # Tables are RUNTIME ARGS, never jit-captured constants: the axon
        # remote-compile path rejects multi-GB captured payloads.
        def chain(q, item_, ip_, seed):
            def body(carry, _):
                qq = q * (1.0 + carry * 1e-12)
                s = score(qq, item_, ip_)
                # Stack only a strided slice: (runs, B, X) f32 would be 2 GB.
                return jnp.sum(s[:, :1]), jnp.sum(s[:, ::4096])
            c0 = seed.astype(jnp.float32)
            c, ss = jax.lax.scan(body, c0, (), length=args.runs)
            return c + ss[-1]

        ms, _ = timed(chain, q0, item, ip)
        results[mode] = round(ms, 2)
        print(f"mode={mode}: {ms:.2f} ms/batch "
              f"({ms / (x / 1e6):.2f} ms per M items, B={b})", flush=True)

    # Select-term accounting: hierarchical top-k alone over a precomputed
    # (B, X) score row (the term the emit-from-VMEM restructure removes,
    # together with the score-row write measured by `writeonly`).
    scores = jnp.asarray(
        rng.standard_normal((b, x)).astype(np.float32))

    def sel_chain(srow, seed):
        def body(carry, _):
            s = srow + carry * 1e-12
            v, idx = tk.hierarchical_top_k(s, args.k)
            return jnp.sum(v[:, :1]), ()
        c, _ = jax.lax.scan(body, seed.astype(jnp.float32), (),
                            length=args.runs)
        return c

    ms, _ = timed(sel_chain, scores)
    results["select_hierarchical"] = round(ms, 2)
    print(f"hierarchical select alone: {ms:.2f} ms/batch "
          f"({ms / (x / 1e6):.2f} ms per M items)", flush=True)

    out = {"geometry": dict(p_q=p_q, p_x=p_x, d_p=d_p, h=hdim, batch=b,
                            num_items=x),
           "ms_per_batch": results}
    print(json.dumps(out))
    if args.output_json:
        with open(args.output_json, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
