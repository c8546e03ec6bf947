from a3gc_tpu.utils.checkpoint import (  # noqa: F401
    discover_latest,
    restore_params,
    save_params,
)
from a3gc_tpu.utils.logging import JsonlLogger, write_eval_report  # noqa: F401
