"""Encode-path cost decomposition probe (measurement harness, not serving).

VERDICT r4 #3: encode is 28.3 ms of the 44 ms ML-20M serving step (64%) at
MFU 18.4%, flat for two rounds — this probe produces the instruction-level
accounting that either finds the lever or justifies the number as
structural for the geometry.

Method: a variant of the fused HSTU block kernel (forked from
`ops/pallas/hstu_block._kernel`, internal-time-bias + pointwise-SiLU path —
the exact path ML-20M serving takes) with a `mode` knob that removes ONE
cost term at a time; 16 chained blocks run R times inside ONE jit with the
output carried back as the next input (true serialization — per-call
timings through the axon tunnel cannot resolve sub-25 ms device work, see
tests/conftest + docs/STATUS). Variant deltas against "full" attribute the
encode time to:

  full     everything (cross-checked against the production
           `fused_hstu_block` timing in the same run)
  noact    silu on the (N, F) projection removed      -> silu(y) VPU cost
  linattn  per-head attention silu removed (a = qk)   -> attention
           (mask kept as an explicit multiply)           transcendentals
  nottb    bucketized time-bias removed (relpos only) -> log/gather VPU cost
  noattn   qk/av matmuls removed (attn := v)          -> attention MXU cost
  ident    projection + attention + output proj       -> LN/elementwise floor
           replaced by x passthrough + one dummy mm

Usage (real chip):
  python -m rails_tpu.cli.encode_probe --batch-size 512 --lengths 64,128,192
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def _variant_kernel(
    x_ref, relpos_ref, ext_ref, nxt_ref, tsw_ref, colmask_ref,
    uvqk_ref, ow_ref, ob_ref, out_ref,
    *, group, num_heads, dqk, dv, inv_n, eps, num_buckets, mode,
):
    import jax
    import jax.numpy as jnp

    from rails_tpu.ops.pallas.hstu_block import _lane_gather, _ln, _time_bucket
    from rails_tpu.ops.pallas.mol_scoring import _sigmoid_tanh

    g, n, d = x_ref.shape
    h = num_heads
    mm_dtype = uvqk_ref.dtype

    x2 = x_ref[...].reshape(g * n, d)
    normed = _ln(x2.astype(jnp.float32), eps)
    if mode == "ident":
        # Floor variant: ONE projection matmul (weights resident anyway),
        # no activation, no attention, no output projection.
        y = jnp.dot(normed.astype(mm_dtype), uvqk_ref[...],
                    preferred_element_type=jnp.float32)
        out = y[:, :d] + x2.astype(jnp.float32)
        out_ref[...] = out.reshape(g, n, d).astype(out_ref.dtype)
        return
    y = jnp.dot(normed.astype(mm_dtype), uvqk_ref[...],
                preferred_element_type=jnp.float32)

    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    causal = (col <= row).astype(jnp.float32)

    for gi in range(group):
        y_g = y[gi * n:(gi + 1) * n]
        if mode != "noact":
            y_g = y_g * _sigmoid_tanh(y_g)
        u = y_g[:, : h * dv]
        v = (y_g[:, h * dv: 2 * h * dv] * inv_n).astype(mm_dtype)
        q = y_g[:, 2 * h * dv: 2 * h * dv + h * dqk].astype(mm_dtype)
        k = y_g[:, 2 * h * dv + h * dqk:].astype(mm_dtype)

        colmask_g = colmask_ref[gi, 0][None, :].astype(jnp.float32)
        if mode == "nottb":
            bias = relpos_ref[...]
        else:
            delta = nxt_ref[gi] - ext_ref[gi, 0, :n].reshape(1, n)
            bk = _time_bucket(delta, num_buckets)
            bias = relpos_ref[...] + _lane_gather(tsw_ref[0], bk)
        mask = causal * colmask_g
        if mode == "noattn":
            attn = v.astype(jnp.float32)
        else:
            attn_cols = []
            for head in range(h):
                qh = q[:, head * dqk:(head + 1) * dqk]
                kh = k[:, head * dqk:(head + 1) * dqk]
                vh = v[:, head * dv:(head + 1) * dv]
                qk = jax.lax.dot_general(
                    qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                qk = qk + bias
                if mode == "linattn":
                    a = qk
                else:
                    a = qk * _sigmoid_tanh(qk)
                a = (a * mask).astype(mm_dtype)
                attn_cols.append(
                    jnp.dot(a, vh, preferred_element_type=jnp.float32))
            attn = jnp.concatenate(attn_cols, axis=1)
        a_ln = _ln(attn, eps)
        o_input = jnp.concatenate([u, a_ln, u * a_ln], axis=1)
        out = (
            jnp.dot(o_input.astype(ow_ref.dtype), ow_ref[...],
                    preferred_element_type=jnp.float32)
            + ob_ref[0][None, :]
            + x_ref[gi].astype(jnp.float32)
        )
        out_ref[gi] = out.astype(out_ref.dtype)


def make_block(mode, b, n, d, f, num_heads, dqk, dv, group):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(
        _variant_kernel, group=group, num_heads=num_heads, dqk=dqk, dv=dv,
        inv_n=1.0 / n, eps=1e-6, num_buckets=128, mode=mode,
    )
    import jax.numpy as jnp

    def run(x, relpos, ext3, nxt, tsw, colmask, uvqk, ow, ob):
        in_specs = [
            pl.BlockSpec((group, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, n + 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, n, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ow.shape[0], d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        return pl.pallas_call(
            kernel,
            grid=(b // group,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((group, n, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x, relpos, ext3, nxt, tsw, colmask, uvqk, ow, ob)

    return run


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--lengths", default="64,128,192")
    p.add_argument("--num-blocks", type=int, default=16)
    p.add_argument("--runs", type=int, default=16)
    p.add_argument("--modes",
                   default="full,noact,linattn,nottb,noattn,ident,production")
    p.add_argument("--output-json", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    # ML-20M HSTU geometry (core/config.py:_ml_20m_hstu_mol).
    d, h, dqk, dv, blocks = 256, 8, 32, 32, args.num_blocks
    f = 2 * h * dv + 2 * h * dqk
    b = args.batch_size
    group = 4
    rng = np.random.default_rng(0)
    results = {}
    for n in [int(s) for s in args.lengths.split(",")]:
        x0 = jnp.asarray(rng.standard_normal((b, n, d)) * 0.02, jnp.bfloat16)
        relpos = jnp.asarray(rng.standard_normal((n, n)) * 0.01, jnp.float32)
        ts = np.cumsum(rng.integers(1, 1000, size=(b, n + 1)), axis=1)
        ext = jnp.asarray(ts, jnp.int32)
        ext3 = ext[:, None, :]
        nxt = ext[:, 1:, None]
        tsw = jnp.asarray(rng.standard_normal((1, 128)) * 0.01, jnp.float32)
        lengths = rng.integers(n // 2, n, size=(b,))
        colmask = jnp.asarray(
            (np.arange(n)[None, :] < lengths[:, None]), jnp.float32)[:, None, :]
        uvqk = [jnp.asarray(rng.standard_normal((d, f)) * 0.05, jnp.bfloat16)
                for _ in range(blocks)]
        ow = [jnp.asarray(rng.standard_normal((3 * h * dv, d)) * 0.05,
                          jnp.bfloat16) for _ in range(blocks)]
        ob = [jnp.zeros((1, d), jnp.float32) for _ in range(blocks)]

        def chain(run_block, x, seed):
            # R serialized sweeps through all `blocks` blocks: the output is
            # the next iteration's input, so the scan cannot be collapsed or
            # reordered; `seed` perturbs the start point per timing call to
            # defeat any (executable, args) result caching in the runtime.
            x = x + seed.astype(x.dtype) * 1e-6

            def body(carry, _):
                y = carry
                for li in range(blocks):
                    y = run_block(y, relpos, ext3, nxt, tsw, colmask,
                                  uvqk[li], ow[li], ob[li])
                # Renormalize so 16 residual adds don't blow up over R sweeps.
                y = (y.astype(jnp.float32) * jax.lax.rsqrt(
                    jnp.mean(jnp.square(y.astype(jnp.float32))) + 1e-6
                ) * 0.02).astype(y.dtype)
                return y, ()

            y, _ = jax.lax.scan(body, x, (), length=args.runs)
            return jnp.sum(y.astype(jnp.float32))

        row = {}
        for mode in args.modes.split(","):
            if mode == "production":
                from rails_tpu.ops.pallas.hstu_block import fused_hstu_block

                def run_block(x, relpos, ext3, nxt, tsw, colmask, w, o, obb,
                              _n=n):
                    return fused_hstu_block(
                        x, None, colmask[:, 0, :], w, o, obb[0],
                        num_heads=h, dqk=dqk, dv=dv, inv_n=1.0 / _n,
                        time_bias=(relpos, ext3[:, 0, :], tsw[0]),
                        block_users=group,
                    )
            else:
                run_block = make_block(mode, b, n, d, f, h, dqk, dv, group)
            fn = jax.jit(functools.partial(chain, run_block))
            np.asarray(fn(x0, jnp.int32(0)))  # compile + warm
            best = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(x0, jnp.int32(i + 1)))
                best = min(best, time.perf_counter() - t0)
            ms = best / args.runs * 1e3
            row[mode] = round(ms, 3)
            print(f"n={n} mode={mode}: {ms:.3f} ms per {blocks}-block encode "
                  f"(B={b})", flush=True)
        results[n] = row
    print(json.dumps({"geometry": dict(d=d, h=h, dqk=dqk, dv=dv,
                                       blocks=blocks, batch=b),
                      "ms_per_encode": results}))
    if args.output_json:
        with open(args.output_json, "w") as fh:
            json.dump({"geometry": dict(d=d, h=h, dqk=dqk, dv=dv,
                                        blocks=blocks, batch=b),
                       "ms_per_encode": results}, fh, indent=1)


if __name__ == "__main__":
    main()
