"""Import reference gin config files into `ExperimentConfig`.

The reference configures everything through gin bindings on factory
functions (`/root/reference/train.py:108`, `modeling/similarity_utils.py:41`,
`modeling/sequential/encoder_utils.py:33,67`). A user switching over can
point directly at their existing `.gin` file:

    python -m rails_tpu.cli.train --gin-config-file configs/ml-1m/hstu-mol-...gin

or programmatically `experiment_config_from_gin(path)`. The parser covers the
flat `target.param = <python literal>` binding surface the reference's 14
shipped configs use (no macros/scopes/imports — the reference uses none).

`tests/test_gin_import.py` parses every shipped reference gin file and
asserts the result equals the corresponding hand-registered config
field-for-field — so the named registry and the gin surface can never drift.

CUDA- or torch-runtime-only bindings are accepted and recorded in
`GinImportResult.ignored` rather than failing the parse:
  - `train_fn.enable_tf32` (CUDA tf32 toggle; MXU accumulation is fp32 here),
  - `train_fn.eval_user_max_batch_size` (reference eval micro-batching,
    `eval_from_checkpoint.py`; this repo batches eval by fixed rows),
  - `create_data_loader.num_workers` / `.prefetch_factor` (torch DataLoader
    knobs; this repo's loader prefetches through its own native assembler),
  - `create_mol_interaction_module.uid_embedding_l2_weight_decay` (bound in
    `configs/ml-20m/sasrec-mol-...gin:54` but NOT a parameter of the factory,
    `similarity_utils.py:42-70` — the reference itself would crash resolving
    it; the effective uid-L2 weight is `train_fn.loss_weights`).
"""

from __future__ import annotations

import ast
import dataclasses
import re
from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

from rails_tpu.core.config import (
    DataConfig,
    ExperimentConfig,
    HSTUConfig,
    MoLConfig,
    SASRecConfig,
    TrainConfig,
)

# train_fn params that live outside TrainConfig here.
_TRAIN_FN_SPECIAL = {
    "dataset_name": ("data", "dataset_name"),
    "max_sequence_length": ("data", "max_sequence_length"),
    "positional_sampling_ratio": ("data", "positional_sampling_ratio"),
    "main_module": (None, "model_type"),
    "interaction_module_type": (None, "similarity_type"),
}
_IGNORED = {
    ("train_fn", "enable_tf32"),
    ("train_fn", "eval_user_max_batch_size"),
    ("create_data_loader", "num_workers"),
    ("create_data_loader", "prefetch_factor"),
    ("create_mol_interaction_module", "uid_embedding_l2_weight_decay"),
}

_BINDING_RE = re.compile(
    r"^\s*([A-Za-z_][\w]*)\.([A-Za-z_][\w]*)\s*=\s*(.+?)\s*$"
)


@dataclass
class GinImportResult:
    config: ExperimentConfig
    ignored: List[str]          # accepted-but-inapplicable bindings
    bindings: Dict[Tuple[str, str], Any]


def parse_gin_bindings(text: str) -> Dict[Tuple[str, str], Any]:
    """Parse `target.param = <literal>` lines; comments and blanks skipped."""
    bindings: Dict[Tuple[str, str], Any] = {}
    for lineno, raw in enumerate(text.splitlines(), 1):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        m = _BINDING_RE.match(line)
        if not m:
            raise ValueError(f"gin line {lineno}: cannot parse {raw!r}")
        target, param, rhs = m.groups()
        # Trailing comments (none of the shipped configs use them inside
        # string values; split conservatively outside quotes).
        if "#" in rhs and not (rhs.startswith(("'", '"'))):
            rhs = rhs.split("#", 1)[0].strip()
        try:
            value = ast.literal_eval(rhs)
        except (SyntaxError, ValueError) as e:
            raise ValueError(
                f"gin line {lineno}: value {rhs!r} is not a python literal"
            ) from e
        bindings[(target, param)] = value
    return bindings


def _fields(cls) -> set:
    return {f.name for f in dataclasses.fields(cls)}


def _adopt_tpu_performance_fields(cfg: ExperimentConfig) -> ExperimentConfig:
    """Copy the TPU-side performance toggles (fused kernels) from the
    registry config with the same dataset/model/similarity, when one exists.

    The gin surface describes reference semantics only; without this, a gin
    import of the ml-20m HSTU config would silently skip `hstu.fused_train`
    (the registry default after the convergence A/B) and train ~2x slower
    than `--config ml-20m-hstu-mol`. Pinned by tests/test_gin_import.py,
    which compares gin imports to registry configs WITHOUT masking these
    fields."""
    from rails_tpu.core.config import (
        get_experiment_config,
        list_experiment_configs,
    )

    for reg_name in list_experiment_configs():
        if reg_name.endswith("-fast") or reg_name == "synthetic-small":
            continue
        reg = get_experiment_config(reg_name)
        if (
            reg.model_type == cfg.model_type
            and reg.similarity_type == cfg.similarity_type
            and reg.data.dataset_name == cfg.data.dataset_name
        ):
            return cfg.replace(
                hstu=cfg.hstu.replace(
                    fused_train=reg.hstu.fused_train,
                    fused_inference=reg.hstu.fused_inference,
                ),
                train=cfg.train.replace(
                    fused_optimizer=reg.train.fused_optimizer,
                ),
            )
    return cfg


def experiment_config_from_gin(
    path_or_text: str, name: str | None = None
) -> GinImportResult:
    """Build an `ExperimentConfig` from a reference gin file (path or text)."""
    import os

    looks_like_text = "\n" in path_or_text or "=" in path_or_text
    if os.path.exists(path_or_text) or not looks_like_text:
        with open(path_or_text) as f:
            text = f.read()
        if name is None:
            name = re.sub(r"\.gin$", "", path_or_text.rsplit("/", 1)[-1])
    else:
        text = path_or_text
    bindings = parse_gin_bindings(text)

    top: Dict[str, Any] = {}
    sub: Dict[str, Dict[str, Any]] = {
        "data": {}, "train": {}, "mol": {}, "hstu": {}, "sasrec": {},
    }
    known = {
        "train": _fields(TrainConfig),
        "data": _fields(DataConfig),
        "mol": _fields(MoLConfig),
        "hstu": _fields(HSTUConfig),
        "sasrec": _fields(SASRecConfig),
    }
    ignored: List[str] = []

    for (target, param), value in bindings.items():
        if (target, param) in _IGNORED:
            ignored.append(f"{target}.{param} = {value!r}")
            continue
        if target == "train_fn":
            if param in _TRAIN_FN_SPECIAL:
                section, field_name = _TRAIN_FN_SPECIAL[param]
                if section is None:
                    top[field_name] = value
                else:
                    sub[section][field_name] = value
                continue
            if param == "loss_weights":
                value = tuple(value.items())
            if param not in known["train"]:
                raise ValueError(f"unknown gin binding train_fn.{param}")
            sub["train"][param] = value
        elif target == "hstu_encoder":
            if param not in known["hstu"]:
                raise ValueError(f"unknown gin binding hstu_encoder.{param}")
            sub["hstu"][param] = value
        elif target == "sasrec_encoder":
            if param not in known["sasrec"]:
                raise ValueError(f"unknown gin binding sasrec_encoder.{param}")
            sub["sasrec"][param] = value
        elif target == "create_mol_interaction_module":
            if param == "uid_embedding_hash_sizes":
                value = tuple(value)
            if param not in known["mol"]:
                raise ValueError(
                    f"unknown gin binding create_mol_interaction_module.{param}"
                )
            sub["mol"][param] = value
        elif target == "get_similarity_function":
            if param != "bf16_training":
                raise ValueError(
                    f"unknown gin binding get_similarity_function.{param}"
                )
            sub["mol"]["bf16_training"] = value
        else:
            raise ValueError(f"unknown gin target {target!r}")

    # The reference threads item_embedding_dim from train_fn into the encoder
    # and both MoL sides (`train.py:188-259`, `encoder_utils.py:113-148`).
    d = sub["train"].get("item_embedding_dim", TrainConfig.item_embedding_dim)
    sub["hstu"].setdefault("embedding_dim", d)
    sub["sasrec"].setdefault("embedding_dim", d)
    sub["mol"].setdefault("query_embedding_dim", d)
    sub["mol"].setdefault("item_embedding_dim", d)

    cfg = ExperimentConfig(
        name=name or "gin-imported",
        mol=MoLConfig(**sub["mol"]),
        hstu=HSTUConfig(**sub["hstu"]),
        sasrec=SASRecConfig(**sub["sasrec"]),
        data=DataConfig(**sub["data"]),
        train=TrainConfig(**sub["train"]),
        **top,
    )
    cfg = _adopt_tpu_performance_fields(cfg)
    return GinImportResult(config=cfg, ignored=ignored, bindings=bindings)
