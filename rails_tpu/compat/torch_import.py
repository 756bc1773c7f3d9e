"""Import reference (torch) checkpoints into rails_tpu flax params.

The reference saves `torch.save({"epoch", "batch_id", "model_state_dict",
"optimizer_state_dict"})` (`/root/reference/train.py:538-547`); the model is
DDP-wrapped, so every key carries a `module.` prefix (`train.py:290`), and
legacy checkpoints spell the MoL item projection `_item_proj_module` instead
of `_item_embeddings_fn._item_emb_proj_module`
(`eval_from_checkpoint.py:326-374`). This module maps that state dict onto
the param tree of `models/encoder.py::SequentialRecommender`, so a user of
the reference can bring trained weights over without retraining:

    params, epoch, batch_id = import_torch_checkpoint(path, cfg)

or, end to end, `python -m rails_tpu.cli.import_checkpoint` which writes an
Orbax checkpoint that `cli/eval.py --ckpt` / `cli/train.py
--restore-from-ckpt` restore directly.

The mapping is validated structurally: the converted tree must match the
shapes of a freshly initialized model for `cfg` exactly (any architecture /
geometry mismatch raises with the offending paths), and semantically by
`tests/test_torch_import.py`, which round-trips reference models and asserts
encoder outputs match output-for-output.

Optimizer moments import too (`optimizer_state_from_reference`): the
reference's AdamW state is keyed by parameter POSITION in
`model.parameters()` order (`train.py:293-298`), which equals the
state-dict key order with buffers removed — the same normalization this
module already performs — so each `exp_avg`/`exp_avg_sq` is recovered by
name and pushed through the identical tensor conversion as its parameter
(every mapping is a permutation/transpose/stack, which commutes with the
elementwise Adam update). This makes `--restore-from-ckpt` resume
bit-for-bit mid-schedule; torch AdamW and optax.adamw apply the same
decoupled weight-decay formula (p(1-lr·wd) - lr·û), verified by
`tests/test_torch_import.py::TestOptimizerImport` stepping both optimizers
on identical gradients.

Torch is imported lazily and only needed when the input actually contains
torch tensors; a state dict of numpy arrays converts without torch.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

from rails_tpu.core.config import ExperimentConfig

# Substring renames applied to legacy checkpoints, mirroring
# `eval_from_checkpoint.py:366-374` (which renames only the item-proj linear;
# matching on the module path covers both .weight and .bias).
_LEGACY_RENAMES = {
    "_ndp_module._item_proj_module.":
        "_ndp_module._item_embeddings_fn._item_emb_proj_module.",
}


def _to_numpy(v: Any) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    if not hasattr(v, "detach"):
        # Plain Python number — e.g. AdamW's `step` in torch<2.0 state dicts.
        return np.asarray(v)
    # torch tensor (incl. bf16, which numpy cannot represent directly).
    t = v.detach().cpu()
    if str(t.dtype) == "torch.bfloat16":
        t = t.float()
    return t.numpy()


def normalize_state_dict(state_dict: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Strip the DDP `module.` prefix, apply legacy renames, drop non-param
    buffers, convert values to numpy."""
    out: Dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        for old, new in _LEGACY_RENAMES.items():
            if old in key:
                key = key.replace(old, new)
                break
        # Non-trained buffers: the causal mask (HSTU/SASRec) and the
        # categorical id->category remap (config data here, carried on the
        # model as `item_id_to_category_id` — `embedding_modules.py:90`).
        if key.endswith(("_attn_mask", "_item_id_to_category_id")):
            continue
        out[key] = _to_numpy(value)
    return out


class _StateView:
    """Dict view that records consumption so leftovers can be reported."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self._sd = sd
        self._used = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self._sd:
            raise KeyError(
                f"reference checkpoint is missing {key!r}; nearest keys: "
                f"{[k for k in self._sd if k.split('.')[-1] == key.split('.')[-1]][:4]}"
            )
        self._used.add(key)
        return self._sd[key]

    def has(self, key: str) -> bool:
        return key in self._sd

    def keys_under(self, prefix: str):
        return [k for k in self._sd if k.startswith(prefix)]

    def unused(self):
        return sorted(set(self._sd) - self._used)


def _dense(sv: _StateView, prefix: str) -> dict:
    """torch Linear at `prefix` -> flax Dense {kernel (in, out)[, bias]}."""
    p = {"kernel": sv.take(prefix + ".weight").T}
    if sv.has(prefix + ".bias"):
        p["bias"] = sv.take(prefix + ".bias")
    return p


def _linear_indices(sv: _StateView, prefix: str):
    """Sorted integer child indices of a torch Sequential that hold weights
    (robust to Dropout layers shifting positions,
    `modeling/similarity_utils.py:87-207`)."""
    idx = set()
    for k in sv.keys_under(prefix + "."):
        m = re.match(re.escape(prefix) + r"\.(\d+)\.", k)
        if m:
            idx.add(int(m.group(1)))
    return sorted(idx)


def _proj_mlp(sv: _StateView, prefix: str) -> dict:
    """Reference proj_fn Sequential -> repo ProjMLP. With a hidden layer the
    sequence is (Dropout, GeGLU/SwiGLU, Linear); else (Dropout, Linear)
    (`modeling/similarity_utils.py:87-149`)."""
    idx = _linear_indices(sv, prefix)
    if len(idx) == 2:
        glu_prefix = f"{prefix}.{idx[0]}"
        return {
            "glu": {"w": {
                "kernel": sv.take(glu_prefix + "._w"),
                "bias": sv.take(glu_prefix + "._b")[0],
            }},
            "out": _dense(sv, f"{prefix}.{idx[1]}"),
        }
    assert len(idx) == 1, f"unexpected proj MLP layout under {prefix}: {idx}"
    return {"out": _dense(sv, f"{prefix}.{idx[0]}")}


def _gating_mlp(sv: _StateView, prefix: str) -> dict:
    """Reference gating partial Sequential ([Dropout?] Linear SiLU Linear
    [Dropout?]) -> repo GatingPartialMLP (`similarity_utils.py:153-207`)."""
    idx = _linear_indices(sv, prefix)
    if len(idx) == 2:
        return {
            "hidden": _dense(sv, f"{prefix}.{idx[0]}"),
            "out": _dense(sv, f"{prefix}.{idx[1]}"),
        }
    assert len(idx) == 1, f"unexpected gating MLP layout under {prefix}: {idx}"
    return {"out": _dense(sv, f"{prefix}.{idx[0]}")}


def _mol_params(sv: _StateView, prefix: str = "_ndp_module.") -> dict:
    """Reference `MoLSimilarity` state (`rails/similarities/mol/
    similarity_fn.py`, built by `modeling/similarity_utils.py:74-214`) ->
    repo `similarity/mol.py` param tree."""
    p = {
        "query_proj": _proj_mlp(
            sv, prefix + "_query_embeddings_fn._query_emb_proj_module"
        ),
        "item_proj": _proj_mlp(
            sv, prefix + "_item_embeddings_fn._item_emb_proj_module"
        ),
        "gating_qi": _gating_mlp(sv, prefix + "_gating_fn._qi_partial_module"),
    }
    i = 0
    while sv.has(prefix + f"_query_embeddings_fn._uid_embeddings_{i}.weight"):
        p[f"uid_embeddings_{i}"] = {
            "embedding": sv.take(
                prefix + f"_query_embeddings_fn._uid_embeddings_{i}.weight"
            )
        }
        i += 1
    if sv.keys_under(prefix + "_gating_fn._query_only_partial_module"):
        p["gating_query"] = _gating_mlp(
            sv, prefix + "_gating_fn._query_only_partial_module"
        )
    if sv.keys_under(prefix + "_gating_fn._item_only_partial_module"):
        p["gating_item"] = _gating_mlp(
            sv, prefix + "_gating_fn._item_only_partial_module"
        )
    return p


def _hstu_params(sv: _StateView) -> dict:
    """Reference `HSTUJagged` layer stack (`modeling/sequential/hstu.py:
    218-433`) -> repo `models/hstu.py::HSTUStack`. The repo stacks the
    per-layer relative-bias tables into (L, ...) arrays for a single
    row-gather per step."""
    layers = sorted(
        {
            int(re.match(r"_hstu\._attention_layers\.(\d+)\.", k).group(1))
            for k in sv.keys_under("_hstu._attention_layers.")
        }
    )
    assert layers == list(range(len(layers)))
    tree: dict = {}
    has_bias = sv.has("_hstu._attention_layers.0._rel_attn_bias._pos_w")
    if has_bias:
        tree["rel_attn_bias"] = {
            "pos_w": np.stack(
                [
                    sv.take(f"_hstu._attention_layers.{i}._rel_attn_bias._pos_w")
                    for i in layers
                ]
            ),
            "ts_w": np.stack(
                [
                    sv.take(f"_hstu._attention_layers.{i}._rel_attn_bias._ts_w")
                    for i in layers
                ]
            ),
        }
    for i in layers:
        pre = f"_hstu._attention_layers.{i}"
        tree[f"block_{i}"] = {
            "uvqk": sv.take(pre + "._uvqk"),
            "o_kernel": sv.take(pre + "._o.weight").T,
            "o_bias": sv.take(pre + "._o.bias"),
        }
    return tree


def _sasrec_params(sv: _StateView, d_model: int) -> dict:
    """Reference `SASRec` (`modeling/sequential/sasrec.py:77-290`:
    nn.MultiheadAttention + Conv1d FFN) -> repo `models/sasrec.py`."""
    layers = sorted(
        {
            int(re.match(r"attention_layers\.(\d+)\.", k).group(1))
            for k in sv.keys_under("attention_layers.")
        }
    )
    tree: dict = {}
    for i in layers:
        w = sv.take(f"attention_layers.{i}.in_proj_weight")       # (3D, D)
        b = sv.take(f"attention_layers.{i}.in_proj_bias")         # (3D,)
        d = d_model
        assert w.shape == (3 * d, d), (w.shape, d)
        ffn = f"forward_layers.{i}._conv1d"
        tree[f"block_{i}"] = {
            "q_proj": {"kernel": w[:d].T, "bias": b[:d]},
            "k_proj": {"kernel": w[d: 2 * d].T, "bias": b[d: 2 * d]},
            "v_proj": {"kernel": w[2 * d:].T, "bias": b[2 * d:]},
            "out_proj": _dense(sv, f"attention_layers.{i}.out_proj"),
            "ffn": {
                # Conv1d(D, H, kernel_size=1).weight is (H, D, 1).
                "fc1": {
                    "kernel": sv.take(ffn + ".0.weight")[:, :, 0].T,
                    "bias": sv.take(ffn + ".0.bias"),
                },
                "fc2": {
                    "kernel": sv.take(ffn + ".3.weight")[:, :, 0].T,
                    "bias": sv.take(ffn + ".3.bias"),
                },
            },
        }
    return tree


def _preproc_params(sv: _StateView, cfg: ExperimentConfig) -> dict:
    """Input preprocessor params (`input_features_preprocessors.py:26-267`)."""
    p = {"pos_emb": sv.take("_input_features_preproc._pos_emb.weight")}
    if cfg.input_preprocessor_type in ("rated", "combined"):
        p["rating_emb"] = sv.take("_input_features_preproc._rating_emb.weight")
    return p


def params_from_reference_state_dict(
    state_dict: Dict[str, Any],
    cfg: ExperimentConfig,
    num_items: int | None = None,
    strict: bool = True,
    validate: bool = True,
) -> dict:
    """Convert a reference `model_state_dict` to `{"params": tree}`.

    num_items defaults to the embedding-table row count minus the padding
    row. With `strict`, unconsumed reference keys raise (catches silently
    dropped weights). With `validate`, the result is shape-checked against a
    fresh abstract init of the model for `cfg`.
    """
    sv = _StateView(normalize_state_dict(state_dict))
    emb = sv.take("_embedding_module._item_emb.weight")
    if num_items is None:
        if cfg.embedding_module_type == "categorical":
            raise ValueError(
                "categorical embedding checkpoints store a (num_categories"
                " + 1, D) table, so num_items (the max item id) cannot be"
                " inferred from it — pass num_items explicitly"
            )
        num_items = emb.shape[0] - 1

    tree: dict = {
        "item_emb": {"embedding": emb},
        "input_preproc": _preproc_params(sv, cfg),
    }
    if cfg.model_type == "HSTU":
        tree["hstu"] = _hstu_params(sv)
    elif cfg.model_type == "SASRec":
        d_model = cfg.train.item_embedding_dim
        if cfg.input_preprocessor_type == "rated":
            d_model += cfg.rating_embedding_dim
        tree["sasrec"] = _sasrec_params(sv, d_model)
    else:
        raise ValueError(f"Unknown model_type {cfg.model_type!r}")
    if cfg.similarity_type == "MoL":
        tree["mol"] = _mol_params(sv)
    # DotProduct similarity is parameter-free on both sides
    # (`rails/similarities/dot_product_similarity_fn.py:24-68`).

    if strict and sv.unused():
        raise ValueError(
            "reference checkpoint keys not consumed by the conversion "
            f"(pass strict=False to ignore): {sv.unused()}"
        )
    params = {"params": tree}
    if validate:
        _validate_against_fresh_init(params, cfg, num_items)
    return params


def _validate_against_fresh_init(
    params: dict, cfg: ExperimentConfig, num_items: int
) -> None:
    """Abstract-init the model for `cfg` and require identical tree structure
    and leaf shapes (catches config/checkpoint mismatches loudly)."""
    import jax
    import jax.numpy as jnp

    from rails_tpu.data.features import SequentialFeatures
    from rails_tpu.losses.sampled_softmax import sampled_softmax_loss
    from rails_tpu.losses.samplers import LocalNegativesSampler
    from rails_tpu.models.encoder import SequentialRecommender
    from rails_tpu.train.loop import model_dtype

    remap = (
        np.zeros((num_items,), np.int32)
        if cfg.embedding_module_type == "categorical" else None
    )   # placeholder: only the table SHAPE matters for validation
    model = SequentialRecommender(
        cfg=cfg, num_items=num_items, dtype=model_dtype(cfg),
        item_id_to_category_id=remap,
    )
    n = cfg.max_seq_len_padded
    b = 2
    feats = SequentialFeatures(
        lengths=jnp.full((b,), min(4, n - 1), jnp.int32),
        ids=jnp.ones((b, n), jnp.int32),
        timestamps=jnp.ones((b, n), jnp.int32),
        ratings=jnp.ones((b, n), jnp.int32),
        user_ids=jnp.zeros((b,), jnp.int32),
    )
    sampler = LocalNegativesSampler(
        all_item_ids=jnp.arange(1, num_items + 1, dtype=jnp.int32)
    )

    def _init(rng):
        return model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1),
             "sampler": jax.random.fold_in(rng, 2)},
            feats, sampler, cfg.train.num_negatives, cfg.train.temperature,
            True, method=sampled_softmax_loss,
        )

    expected = jax.eval_shape(_init, jax.random.PRNGKey(0))
    exp_flat = jax.tree_util.tree_flatten_with_path(expected)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    exp_map = {jax.tree_util.keystr(kp): v.shape for kp, v in exp_flat}
    got_map = {jax.tree_util.keystr(kp): np.shape(v) for kp, v in got_flat}
    problems = []
    for path, shape in exp_map.items():
        if path not in got_map:
            problems.append(f"missing from checkpoint: {path} {shape}")
        elif tuple(got_map[path]) != tuple(shape):
            problems.append(
                f"shape mismatch at {path}: checkpoint {got_map[path]} "
                f"vs model {tuple(shape)}"
            )
    for path in got_map:
        if path not in exp_map:
            problems.append(f"unexpected in checkpoint: {path}")
    if problems:
        raise ValueError(
            "converted checkpoint does not fit the model for config "
            f"{cfg.name!r}:\n  " + "\n  ".join(problems)
        )


def optimizer_state_from_reference(
    opt_state_dict: Dict[str, Any],
    model_state_dict: Dict[str, Any],
    cfg: ExperimentConfig,
    params: dict,
    optimizer,
) -> Tuple[Any, int]:
    """Convert a reference `optimizer_state_dict` (torch AdamW,
    `train.py:293-298`) into this repo's optimizer state.

    Returns (opt_state, step_count). Moments are mapped per-parameter by
    recovering the position->name correspondence (parameters() order ==
    buffer-stripped state-dict order) and running each moment tensor through
    the same structural conversion as its parameter. Parameters the torch
    state has not touched yet (lazy init) get zero moments.
    """
    import jax
    import jax.numpy as jnp

    norm_model = normalize_state_dict(model_state_dict)
    norm_keys = list(norm_model)
    order = [
        idx
        for group in opt_state_dict["param_groups"]
        for idx in group["params"]
    ]
    assert len(order) == len(norm_keys), (
        f"optimizer tracks {len(order)} params, model has {len(norm_keys)}"
    )
    key_of_idx = {idx: norm_keys[pos] for pos, idx in enumerate(order)}

    state = opt_state_dict.get("state", {})
    steps = set()
    moment_sds: Dict[str, Dict[str, np.ndarray]] = {
        "exp_avg": {}, "exp_avg_sq": {}
    }
    missing = []
    for idx, key in key_of_idx.items():
        entry = state.get(idx, state.get(str(idx)))
        if entry is None:
            missing.append(key)
            continue
        steps.add(int(_to_numpy(entry["step"])))
        moment_sds["exp_avg"][key] = _to_numpy(entry["exp_avg"])
        moment_sds["exp_avg_sq"][key] = _to_numpy(entry["exp_avg_sq"])
    # torch AdamW keeps a PER-PARAM step and initializes state lazily; the
    # optax/fused layouts carry ONE count. Divergent or missing per-param
    # steps cannot be represented — zero moments with the global count would
    # silently wreck that param's bias correction — so refuse loudly.
    if missing or len(steps) > 1:
        raise ValueError(
            "reference optimizer state is not representable with a single "
            f"step count (params never stepped: {missing[:4]}"
            f"{'...' if len(missing) > 4 else ''}; distinct steps: "
            f"{sorted(steps)}). Import the model weights only "
            "(--skip-optimizer / import_torch_checkpoint)."
        )
    step = steps.pop() if steps else 0

    trees = {}
    for name, sd in moment_sds.items():
        tree = params_from_reference_state_dict(
            sd, cfg, strict=True, validate=False
        )
        # Structural + shape check against the converted params.
        chex_paths = jax.tree_util.tree_structure(tree)
        assert chex_paths == jax.tree_util.tree_structure(params), name
        trees[name] = jax.tree_util.tree_map(jnp.asarray, tree)

    fresh = optimizer.init(jax.tree_util.tree_map(jnp.asarray, params))
    count = jnp.asarray(step, jnp.int32)

    def inject(node):
        """Recursively rebuild the opt-state pytree, replacing Adam moment
        containers (fields mu/nu) and stepping every count field."""
        if hasattr(node, "_fields"):                       # NamedTuple
            replacements = {}
            for f in node._fields:
                if f == "mu":
                    replacements[f] = trees["exp_avg"]
                elif f == "nu":
                    replacements[f] = trees["exp_avg_sq"]
                elif f == "count":
                    replacements[f] = count.astype(getattr(node, f).dtype)
                else:
                    replacements[f] = inject(getattr(node, f))
            return type(node)(**replacements)
        if isinstance(node, tuple):
            return tuple(inject(x) for x in node)
        return node

    return inject(fresh), step


def import_torch_checkpoint(
    path: str,
    cfg: ExperimentConfig,
    num_items: int | None = None,
    strict: bool = True,
) -> Tuple[dict, int, int]:
    """Load a reference checkpoint file and convert it.

    Accepts both the full training payload (`train.py:538-547`) and a bare
    `model_state_dict`. Returns (params, epoch, batch_id); epoch/batch_id are
    0 for bare state dicts.
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    if "model_state_dict" in payload:
        sd = payload["model_state_dict"]
        epoch = int(payload.get("epoch", 0))
        batch_id = int(payload.get("batch_id", 0))
    else:
        sd, epoch, batch_id = payload, 0, 0
    params = params_from_reference_state_dict(
        sd, cfg, num_items=num_items, strict=strict
    )
    return params, epoch, batch_id


def import_torch_checkpoint_full(
    path: str,
    cfg: ExperimentConfig,
    optimizer,
    num_items: int | None = None,
    strict: bool = True,
) -> Tuple[dict, Any, int, int, int]:
    """Like `import_torch_checkpoint`, but also converts the optimizer
    moments when present. Returns (params, opt_state, step, epoch,
    batch_id); opt_state is freshly initialized when the checkpoint carries
    no optimizer state."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    sd = payload.get("model_state_dict", payload)
    epoch = int(payload.get("epoch", 0))
    batch_id = int(payload.get("batch_id", 0))
    params = params_from_reference_state_dict(
        sd, cfg, num_items=num_items, strict=strict
    )
    opt_sd = payload.get("optimizer_state_dict") or {}
    if opt_sd.get("param_groups"):
        opt_state, step = optimizer_state_from_reference(
            opt_sd, sd, cfg, params, optimizer
        )
    else:
        import jax
        import jax.numpy as jnp

        opt_state = optimizer.init(jax.tree_util.tree_map(jnp.asarray, params))
        step = 0
    return params, opt_state, step, epoch, batch_id
