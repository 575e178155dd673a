from watsor_tpu.parallel.mesh import make_mesh, param_shardings, DATA_AXIS, MODEL_AXIS
from watsor_tpu.parallel.fleet import FleetDetector, make_sharded_train_step

__all__ = ["make_mesh", "param_shardings", "DATA_AXIS", "MODEL_AXIS",
           "FleetDetector", "make_sharded_train_step"]
