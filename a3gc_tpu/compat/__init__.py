from a3gc_tpu.compat.torch_import import (  # noqa: F401
    dip_params_from_state_dict,
    graph_net_params_from_state_dict,
    load_torch_checkpoint,
)
from a3gc_tpu.compat.torch_export import (  # noqa: F401
    dip_state_dict,
    graph_net_state_dict,
    save_torch_checkpoint,
)
from a3gc_tpu.compat.torch_data import convert_torch_dataset  # noqa: F401
