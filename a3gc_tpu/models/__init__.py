from a3gc_tpu.models import cells, layers, nets, pipeline  # noqa: F401
