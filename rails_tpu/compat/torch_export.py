"""Export rails_tpu params as a reference-format torch checkpoint.

The inverse of `torch_import.py`: a param tree from this repo becomes a
`model_state_dict` the reference implementation loads with
`load_state_dict(strict=True)` (keys/shapes exactly as
`/root/reference/train.py:538-547` saves them, `module.` DDP prefix
included). Use cases: validating a TPU-trained model inside the reference
stack, or serving it from an existing torch deployment.

Buffers the reference registers but does not train (`HSTU._attn_mask`) are
reconstructed from the config. Round-trip (export -> import) is the
identity, and the exported model's outputs match this repo's —
`tests/test_torch_export.py`.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from rails_tpu.core.config import ExperimentConfig


def _np(v: Any) -> np.ndarray:
    return np.asarray(v)


def _dense(out: Dict[str, np.ndarray], prefix: str, p: dict) -> None:
    out[prefix + ".weight"] = _np(p["kernel"]).T
    if "bias" in p:
        out[prefix + ".bias"] = _np(p["bias"])


def _proj_mlp(out, prefix: str, p: dict, hidden: bool) -> None:
    """Inverse of `torch_import._proj_mlp`: (Dropout, GLU, Linear) indices
    1/2 with a hidden layer, (Dropout, Linear) index 1 without
    (`modeling/similarity_utils.py:87-149`)."""
    if hidden:
        out[prefix + ".1._w"] = _np(p["glu"]["w"]["kernel"])
        out[prefix + ".1._b"] = _np(p["glu"]["w"]["bias"])[None, :]
        _dense(out, prefix + ".2", p["out"])
    else:
        _dense(out, prefix + ".1", p["out"])


def _gating_mlp(out, prefix: str, p: dict, leading_dropout: bool) -> None:
    """Inverse of `torch_import._gating_mlp` ([Dropout?] Linear SiLU Linear,
    `similarity_utils.py:153-207`)."""
    i0 = 1 if leading_dropout else 0
    if "hidden" in p:
        _dense(out, f"{prefix}.{i0}", p["hidden"])
        _dense(out, f"{prefix}.{i0 + 2}", p["out"])
    else:
        _dense(out, f"{prefix}.{i0}", p["out"])


def _mol_state(out, mol: dict, cfg: ExperimentConfig) -> None:
    m = cfg.mol
    pre = "_ndp_module."
    _proj_mlp(
        out, pre + "_query_embeddings_fn._query_emb_proj_module",
        mol["query_proj"], hidden=m.query_hidden_dim > 0,
    )
    _proj_mlp(
        out, pre + "_item_embeddings_fn._item_emb_proj_module",
        mol["item_proj"], hidden=m.item_hidden_dim > 0,
    )
    _gating_mlp(
        out, pre + "_gating_fn._qi_partial_module", mol["gating_qi"],
        leading_dropout=True,
    )
    if "gating_query" in mol:
        _gating_mlp(
            out, pre + "_gating_fn._query_only_partial_module",
            mol["gating_query"], leading_dropout=False,
        )
    if "gating_item" in mol:
        _gating_mlp(
            out, pre + "_gating_fn._item_only_partial_module",
            mol["gating_item"], leading_dropout=True,
        )
    for i in range(len(m.uid_embedding_hash_sizes)):
        out[pre + f"_query_embeddings_fn._uid_embeddings_{i}.weight"] = _np(
            mol[f"uid_embeddings_{i}"]["embedding"]
        )


def _hstu_state(out, hstu: dict) -> None:
    blocks = sorted(
        int(k.split("_")[1]) for k in hstu if k.startswith("block_")
    )
    has_bias = "rel_attn_bias" in hstu
    for i in blocks:
        pre = f"_hstu._attention_layers.{i}"
        out[pre + "._uvqk"] = _np(hstu[f"block_{i}"]["uvqk"])
        out[pre + "._o.weight"] = _np(hstu[f"block_{i}"]["o_kernel"]).T
        out[pre + "._o.bias"] = _np(hstu[f"block_{i}"]["o_bias"])
        if has_bias:
            out[pre + "._rel_attn_bias._pos_w"] = _np(
                hstu["rel_attn_bias"]["pos_w"]
            )[i]
            out[pre + "._rel_attn_bias._ts_w"] = _np(
                hstu["rel_attn_bias"]["ts_w"]
            )[i]


def _sasrec_state(out, sasrec: dict) -> None:
    blocks = sorted(
        int(k.split("_")[1]) for k in sasrec if k.startswith("block_")
    )
    for i in blocks:
        blk = sasrec[f"block_{i}"]
        w = np.concatenate(
            [
                _np(blk["q_proj"]["kernel"]).T,
                _np(blk["k_proj"]["kernel"]).T,
                _np(blk["v_proj"]["kernel"]).T,
            ],
            axis=0,
        )
        b = np.concatenate(
            [_np(blk[k]["bias"]) for k in ("q_proj", "k_proj", "v_proj")]
        )
        out[f"attention_layers.{i}.in_proj_weight"] = w
        out[f"attention_layers.{i}.in_proj_bias"] = b
        _dense(out, f"attention_layers.{i}.out_proj", blk["out_proj"])
        ffn = f"forward_layers.{i}._conv1d"
        out[ffn + ".0.weight"] = _np(blk["ffn"]["fc1"]["kernel"]).T[:, :, None]
        out[ffn + ".0.bias"] = _np(blk["ffn"]["fc1"]["bias"])
        out[ffn + ".3.weight"] = _np(blk["ffn"]["fc2"]["kernel"]).T[:, :, None]
        out[ffn + ".3.bias"] = _np(blk["ffn"]["fc2"]["bias"])


def reference_state_dict_from_params(
    params: dict,
    cfg: ExperimentConfig,
    ddp_prefix: bool = True,
    include_buffers: bool = True,
) -> Dict[str, np.ndarray]:
    """Convert `{"params": tree}` (or the bare tree) to a reference-keyed
    state dict of numpy arrays."""
    tree = params.get("params", params)
    out: Dict[str, np.ndarray] = {}
    if include_buffers:
        # Both encoders register a causal-mask buffer
        # (`hstu.py:616-628`, `sasrec.py:144-153`), sized to the padded
        # total sequence length.
        n = cfg.max_seq_len_padded
        out["_attn_mask"] = np.triu(np.ones((n, n), dtype=bool), k=1)
    out["_embedding_module._item_emb.weight"] = _np(
        tree["item_emb"]["embedding"]
    )
    out["_input_features_preproc._pos_emb.weight"] = _np(
        tree["input_preproc"]["pos_emb"]
    )
    if cfg.input_preprocessor_type in ("rated", "combined"):
        out["_input_features_preproc._rating_emb.weight"] = _np(
            tree["input_preproc"]["rating_emb"]
        )
    if cfg.model_type == "HSTU":
        _hstu_state(out, tree["hstu"])
    else:
        _sasrec_state(out, tree["sasrec"])
    if cfg.similarity_type == "MoL":
        _mol_state(out, tree["mol"], cfg)
    if ddp_prefix:
        out = {f"module.{k}": v for k, v in out.items()}
    return out


def export_torch_checkpoint(
    params: dict,
    cfg: ExperimentConfig,
    path: str,
    epoch: int = 0,
    batch_id: int = 0,
) -> None:
    """Write a torch checkpoint file in the reference's exact payload format
    (`train.py:538-547`); optimizer state is left empty."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(np.asarray(v, np.float32)))
        if v.dtype != bool else torch.from_numpy(v)
        for k, v in reference_state_dict_from_params(params, cfg).items()
    }
    torch.save(
        {
            "epoch": epoch,
            "batch_id": batch_id,
            "model_state_dict": sd,
            "optimizer_state_dict": {},
        },
        path,
    )
