"""Loader + weight-transplant helpers for cross-implementation parity tests.

Runs the REFERENCE implementation (`/root/reference`, torch) on CPU and maps
its weights into this repo's flax params so outputs can be compared
numerically. The reference depends on `gin` (absent) and `fbgemm_gpu` custom
ops (absent); both are stubbed here with behavior-equivalent pure-torch
implementations:

  - `gin.configurable` is an identity decorator (the reference only uses it
    to expose kwargs to gin config files, which we pass explicitly);
  - `torch.ops.fbgemm.{jagged_to_padded_dense, dense_to_jagged,
    asynchronous_complete_cumsum}` are reimplemented in ~25 lines of plain
    torch (semantics per fbgemm docs; used by the reference at
    `modeling/sequential/hstu.py:189-214,524-529` and
    `modeling/sequential/losses/sampled_softmax.py:125-193`).

Nothing here is imported by the framework itself — test-only.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def load_reference_rails():
    """Import torch + the reference packages with gin/fbgemm stubs installed.

    Returns the `torch` module; reference modules are then importable
    (`rails.*`, `modeling.*`). Raises ImportError if torch is unavailable.
    """
    os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")
    import torch
    import torch._dynamo

    torch._dynamo.config.disable = True   # run @torch.compile fns eagerly

    if "gin" not in sys.modules:
        gin = types.ModuleType("gin")

        def _configurable(fn=None, **kw):
            if fn is None or not callable(fn):
                return lambda f: f
            return fn

        gin.configurable = _configurable
        gin.constant = lambda *a, **k: None
        gin.parse_config_file = lambda *a, **k: None
        sys.modules["gin"] = gin

    if not isinstance(getattr(torch.ops, "fbgemm", None), types.SimpleNamespace):
        def _acc(lengths):
            z = torch.zeros(1, dtype=lengths.dtype, device=lengths.device)
            return torch.cat([z, lengths.cumsum(0)]).to(lengths.dtype)

        def _j2p(values, offsets, max_lengths, padding_value=0.0):
            off = offsets[0]
            n = int(max_lengths[0])
            b = off.numel() - 1
            out = torch.full(
                (b, n) + tuple(values.shape[1:]), float(padding_value),
                dtype=values.dtype,
            )
            for i in range(b):
                s, e = int(off[i]), int(off[i + 1])
                out[i, : e - s] = values[s:e]
            return out

        def _d2j(dense, offsets, total_L=None):
            off = offsets[0]
            b = off.numel() - 1
            rows = [dense[i, : int(off[i + 1]) - int(off[i])] for i in range(b)]
            return torch.cat(rows, dim=0), offsets

        torch.ops.fbgemm = types.SimpleNamespace(
            jagged_to_padded_dense=_j2p,
            dense_to_jagged=_d2j,
            asynchronous_complete_cumsum=_acc,
        )

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return torch


# ------------------------------------------------------------------ #
# torch -> flax weight transplant.
# ------------------------------------------------------------------ #


def t2j(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy())


def dense_from_linear(lin) -> dict:
    """torch Linear(out, in) -> flax Dense {kernel (in, out), bias}."""
    p = {"kernel": t2j(lin.weight).T}
    if lin.bias is not None:
        p["bias"] = t2j(lin.bias)
    return p


def glu_from_torch(glu) -> dict:
    """Reference GeGLU/SwiGLU (`rails/similarities/layers.py:19-74`:
    x @ _w + _b, split) -> repo GLU (one Dense named "w")."""
    return {"w": {"kernel": t2j(glu._w), "bias": t2j(glu._b)[0]}}


def proj_mlp_from_torch(seq, hidden: bool) -> dict:
    """Reference proj_fn Sequential (`modeling/similarity_utils.py:87-149`)
    -> repo ProjMLP. With hidden: (Dropout, GLU, Linear); else
    (Dropout, Linear)."""
    if hidden:
        return {"glu": glu_from_torch(seq[1]), "out": dense_from_linear(seq[2])}
    return {"out": dense_from_linear(seq[1])}


def gating_mlp_from_torch(seq, leading_dropout: bool, hidden: bool = True) -> dict:
    """Reference gating partial Sequential (`similarity_utils.py:153-207`)
    -> repo GatingPartialMLP. Layout: [Dropout?] Linear SiLU Linear."""
    i0 = 1 if leading_dropout else 0
    if hidden:
        return {
            "hidden": dense_from_linear(seq[i0]),
            "out": dense_from_linear(seq[i0 + 2]),
        }
    return {"out": dense_from_linear(seq[i0])}


def mol_params_from_torch(ref_mol, mol_cfg) -> dict:
    """Map a reference `MoLSimilarity` (built by
    `create_mol_interaction_module`, `modeling/similarity_utils.py:74-214`)
    onto the repo `similarity/mol.py` param tree."""
    p = {
        "query_proj": proj_mlp_from_torch(
            ref_mol._query_embeddings_fn._query_emb_proj_module,
            hidden=mol_cfg.query_hidden_dim > 0,
        ),
        "item_proj": proj_mlp_from_torch(
            ref_mol._item_embeddings_fn._item_emb_proj_module,
            hidden=mol_cfg.item_hidden_dim > 0,
        ),
        "gating_qi": gating_mlp_from_torch(
            ref_mol._gating_fn._qi_partial_module,
            leading_dropout=True,
            hidden=mol_cfg.gating_qi_hidden_dim > 0,
        ),
    }
    for i in range(len(mol_cfg.uid_embedding_hash_sizes)):
        emb = getattr(ref_mol._query_embeddings_fn, f"_uid_embeddings_{i}")
        p[f"uid_embeddings_{i}"] = {"embedding": t2j(emb.weight)}
    if ref_mol._gating_fn._query_only_partial_module is not None:
        p["gating_query"] = gating_mlp_from_torch(
            ref_mol._gating_fn._query_only_partial_module, leading_dropout=False
        )
    if ref_mol._gating_fn._item_only_partial_module is not None:
        p["gating_item"] = gating_mlp_from_torch(
            ref_mol._gating_fn._item_only_partial_module, leading_dropout=True
        )
    return p


def make_reference_mol(torch, mol_cfg, query_dim: int, item_dim: int):
    """Instantiate the reference MoL via its own factory with the kwargs the
    repo's MoLConfig mirrors (`modeling/similarity_utils.py:42-70`)."""
    from modeling.similarity_utils import create_mol_interaction_module

    mol, dbg = create_mol_interaction_module(
        query_embedding_dim=query_dim,
        item_embedding_dim=item_dim,
        dot_product_dimension=mol_cfg.dot_product_dimension,
        query_dot_product_groups=mol_cfg.query_dot_product_groups,
        item_dot_product_groups=mol_cfg.item_dot_product_groups,
        temperature=mol_cfg.temperature,
        query_dropout_rate=mol_cfg.query_dropout_rate,
        query_hidden_dim=mol_cfg.query_hidden_dim,
        item_dropout_rate=mol_cfg.item_dropout_rate,
        item_hidden_dim=mol_cfg.item_hidden_dim,
        gating_query_hidden_dim=mol_cfg.gating_query_hidden_dim,
        gating_qi_hidden_dim=mol_cfg.gating_qi_hidden_dim,
        gating_item_hidden_dim=mol_cfg.gating_item_hidden_dim,
        softmax_dropout_rate=mol_cfg.softmax_dropout_rate,
        bf16_training=False,
        gating_query_fn=mol_cfg.gating_query_fn,
        gating_item_fn=mol_cfg.gating_item_fn,
        dot_product_l2_norm=mol_cfg.dot_product_l2_norm,
        query_nonlinearity=mol_cfg.query_nonlinearity,
        item_nonlinearity=mol_cfg.item_nonlinearity,
        uid_dropout_rate=mol_cfg.uid_dropout_rate,
        uid_embedding_hash_sizes=list(mol_cfg.uid_embedding_hash_sizes) or None,
        uid_embedding_level_dropout=mol_cfg.uid_embedding_level_dropout,
        gating_combination_type=mol_cfg.gating_combination_type,
        gating_item_dropout_rate=mol_cfg.gating_item_dropout_rate,
        gating_qi_dropout_rate=mol_cfg.gating_qi_dropout_rate,
        eps=mol_cfg.eps,
    )
    return mol
