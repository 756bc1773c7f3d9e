"""Compatibility layer for migrating from the reference implementation."""

from rails_tpu.compat.torch_import import (  # noqa: F401
    import_torch_checkpoint,
    params_from_reference_state_dict,
)
