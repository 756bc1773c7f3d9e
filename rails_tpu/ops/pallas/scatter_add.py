"""Binned scatter-add for embedding-table gradients (+ custom-VJP gather).

XLA lowers the dense cotangent of ``table[ids]`` — ``zeros.at[ids].add(g)``
— into a serialized per-row scatter: measured 6.2 ms/step at Books scale
(13k update rows into a 695762 x 64 table, v5e), with presorting variants
no better than 4.8 ms (``_prof_scatter.py``). This kernel computes the
same dense cotangent differently: sort the update rows once (XLA argsort),
bin them to table row-blocks with searchsorted bounds, and let each grid
step accumulate its block's updates in VMEM via one-hot matmuls over
fixed-size update chunks DMA'd from HBM — the scatter becomes a few MXU
ops per block instead of M serialized HBM row read-modify-writes.

Exactness: the one-hot contraction is fp32 with fp32 accumulation, so
duplicate ids sum in fp32 exactly like the XLA scatter (modulo addition
order). Out-of-range ids (< 0 or >= num_rows) are dropped, matching
XLA's out-of-bounds scatter semantics.

Reference context: the reference trains its item table through torch
autograd's dense embedding scatter + dense AdamW (`train.py:293-298`);
`gather_rows` is the TPU-native replacement for that gradient path
(opt-in via `train.pallas_scatter_grad`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(bounds_ref, ids_hbm, rows_hbm, out_ref, ids_vmem, rows_vmem,
            sems, *, block_rows: int, chunk: int, m_pad: int):
    b = pl.program_id(0)
    base = b * block_rows
    lo = bounds_ref[b]
    hi = bounds_ref[b + 1]
    out_ref[...] = jnp.zeros_like(out_ref)
    # DMA offsets must be PROVABLY tiling-aligned (Mosaic rejects a
    # data-dependent lane offset: "Failed to prove that a tile index in
    # dimension 1 is divisible by the tiling (128)"). Walk chunk-ALIGNED
    # windows covering [lo, hi) — (lo // chunk) * chunk is divisible by
    # chunk (a 128-multiple) by construction, and m_pad is a chunk
    # multiple so every window is in bounds; the `pos` mask drops the
    # under/overhang.
    c0 = (lo // chunk) * chunk
    nchunks = (hi - c0 + chunk - 1) // chunk

    def body(ci, carry):
        j0 = c0 + ci * chunk
        cp_ids = pltpu.make_async_copy(
            ids_hbm.at[:, pl.ds(j0, chunk)], ids_vmem, sems.at[0]
        )
        cp_rows = pltpu.make_async_copy(
            rows_hbm.at[pl.ds(j0, chunk), :], rows_vmem, sems.at[1]
        )
        cp_ids.start()
        cp_rows.start()
        cp_ids.wait()
        ids_c = ids_vmem[...]                                  # (1, C)
        pos = j0 + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        valid = (pos >= lo) & (pos < hi)
        # Invalid slots map to row `block_rows`, which no one-hot lane
        # matches -> zero contribution.
        local = jnp.where(valid, ids_c - base, block_rows)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (block_rows, chunk), 0)
            == local
        ).astype(jnp.float32)
        cp_rows.wait()
        contrib = jax.lax.dot(
            onehot, rows_vmem[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        out_ref[...] += contrib
        return carry

    jax.lax.fori_loop(0, nchunks, body, 0)


def scatter_add_rows(
    ids: jnp.ndarray,
    rows: jnp.ndarray,
    num_rows: int,
    *,
    block_rows: int = 2048,
    chunk: int = 512,
    interpret: Optional[bool] = None,
    out_dtype=None,
) -> jnp.ndarray:
    """``jnp.zeros((num_rows, D)).at[ids].add(rows)`` as a binned kernel.

    ids: int array, any shape (M total ids). rows: ids.shape + (D,).
    Returns (num_rows, D) in ``out_dtype`` (default ``rows.dtype``);
    accumulation is fp32.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out_dtype = out_dtype or rows.dtype
    d = rows.shape[-1]
    m = ids.size
    assert rows.size == m * d, (ids.shape, rows.shape)
    if d < 128 and num_rows > 1:
        # Lane-pack narrow tables: Mosaic rejects sub-128-lane HBM row
        # slices ("Slice shape along dimension 1 must be aligned to tiling
        # (128), but is 64" — the Books D=64 table, docs/STATUS.md r4).
        # View the (num_rows, d) table as (ceil(num_rows/pack), 128) with
        # pack = 128/d_pad consecutive rows per lane-row (d_pad = next
        # power of two >= d; the pad lanes stay zero): update row i
        # scatters into packed row i // pack at lane group i % pack. Same
        # fp32 accumulation (disjoint lane groups never collide; duplicates
        # of one id still sum), and the kernel runs FULL-lane. This is the
        # fused_adamw (n/128, 128) reshape trick applied to the scatter.
        d_pad = 1 << (d - 1).bit_length()
        pack = 128 // d_pad
        ids_p = ids.reshape(-1).astype(jnp.int32)
        ids_p = jnp.where(ids_p < 0, ids_p + num_rows, ids_p)
        valid = (ids_p >= 0) & (ids_p < num_rows)
        rows_p = rows.reshape(m, d)
        if d_pad != d:
            rows_p = jnp.pad(rows_p, ((0, 0), (0, d_pad - d)))
        slot = ids_p % pack
        lane_grp = jnp.arange(128, dtype=jnp.int32) // d_pad
        rows128 = jnp.where(
            lane_grp[None, :] == slot[:, None],
            jnp.tile(rows_p, (1, pack)),
            jnp.zeros((), rows_p.dtype),
        )
        n128 = -(-num_rows // pack)
        out = scatter_add_rows(
            jnp.where(valid, ids_p // pack, n128), rows128, n128,
            block_rows=block_rows, chunk=chunk, interpret=interpret,
            out_dtype=jnp.float32,
        )
        out = out.reshape(n128 * pack, d_pad)[:num_rows]
        if d_pad != d:
            out = out[:, :d]
        return out.astype(out_dtype)
    ids_f = ids.reshape(-1).astype(jnp.int32)
    rows_f = rows.reshape(m, d)
    nb = -(-num_rows // block_rows)
    sentinel = jnp.int32(nb * block_rows)
    # jnp `.at[ids].add` wraps negative indices once (numpy semantics);
    # anything still out of range after the wrap is dropped.
    ids_f = jnp.where(ids_f < 0, ids_f + num_rows, ids_f)
    order = jnp.argsort(ids_f)
    ids_s = ids_f[order]
    rows_s = rows_f[order]
    # Negative ids sort first; bounds[0] (searchsorted of 0) skips them.
    # Ids in [num_rows, nb*block_rows) land in the last block's padding
    # rows, which the partial-block writeback masks off. Remap ids >=
    # the padded extent to the sentinel so they can't alias a real block.
    ids_s = jnp.where(ids_s >= sentinel, sentinel, ids_s)
    # A chunk multiple, so every chunk-aligned DMA window is in bounds.
    m_pad = -(-max(chunk, m) // chunk) * chunk
    if m_pad > m:
        ids_s = jnp.concatenate(
            [ids_s, jnp.full((m_pad - m,), sentinel, jnp.int32)]
        )
        rows_s = jnp.concatenate(
            [rows_s, jnp.zeros((m_pad - m, d), rows_s.dtype)]
        )
    edges = jnp.arange(nb + 1, dtype=jnp.int32) * block_rows
    bounds = jnp.searchsorted(ids_s, edges).astype(jnp.int32)

    kernel = functools.partial(
        _kernel, block_rows=block_rows, chunk=chunk, m_pad=m_pad
    )
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # bounds (nb+1,)
            pl.BlockSpec(memory_space=pltpu.ANY),      # ids (1, m_pad) HBM
            pl.BlockSpec(memory_space=pltpu.ANY),      # rows (m_pad, d) HBM
        ],
        out_specs=pl.BlockSpec(
            (block_rows, d), lambda b: (b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_rows, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, chunk), jnp.int32),
            pltpu.VMEM((chunk, d), rows_s.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(bounds, ids_s.reshape(1, m_pad), rows_s)
    return out.astype(out_dtype)


@jax.custom_vjp
def gather_rows(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """``table[ids]`` whose backward is the binned Pallas scatter-add."""
    return table[ids]


def _gather_fwd(table, ids):
    return table[ids], (table, ids)


def _gather_bwd(res, g):
    table, ids = res
    dt = scatter_add_rows(
        ids, g.reshape(ids.size, table.shape[-1]), table.shape[0],
        out_dtype=table.dtype,
    )
    return dt, None


gather_rows.defvjp(_gather_fwd, _gather_bwd)
