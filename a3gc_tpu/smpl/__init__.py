from a3gc_tpu.smpl.armature import MANOJoint, SMPLHJoint, SMPLJoint  # noqa: F401
from a3gc_tpu.smpl.model import (  # noqa: F401
    ParametricModel,
    load_parametric_model,
)
from a3gc_tpu.smpl.synthetic import synthetic_smpl_data, write_synthetic_smpl_pickle  # noqa: F401
