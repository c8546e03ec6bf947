from a3gc_tpu.train.loop import (  # noqa: F401
    GracefulInterrupt,
    StageRunner,
    TrainState,
    make_optimizer,
    run_cascade_training,
    stage_inputs_graph,
    stage_inputs_flat,
)
