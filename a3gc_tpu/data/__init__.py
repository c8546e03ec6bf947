from a3gc_tpu.data.adjacency import load_adjacency_template  # noqa: F401
