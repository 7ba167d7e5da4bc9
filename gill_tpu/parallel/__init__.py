from gill_tpu.parallel.mesh import create_mesh  # noqa: F401
from gill_tpu.parallel.partition import param_shardings, batch_sharding  # noqa: F401
