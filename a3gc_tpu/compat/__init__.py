from a3gc_tpu.compat.torch_import import (  # noqa: F401
    dip_params_from_state_dict,
    graph_net_params_from_state_dict,
    load_torch_checkpoint,
)
