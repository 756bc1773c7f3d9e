"""Compatibility layer for migrating to/from the reference implementation."""

from rails_tpu.compat.torch_import import (  # noqa: F401
    import_torch_checkpoint,
    import_torch_checkpoint_full,
    optimizer_state_from_reference,
    params_from_reference_state_dict,
)
from rails_tpu.compat.torch_export import (  # noqa: F401
    export_torch_checkpoint,
    reference_state_dict_from_params,
)
from rails_tpu.compat.gin_import import (  # noqa: F401
    experiment_config_from_gin,
)
