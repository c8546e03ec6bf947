from a3gc_tpu.eval.run import (  # noqa: F401
    CascadeEvaluator,
    bucket_length,
    evaluate_sequences,
    prepare_graph_inputs,
)
