from fem_tpu.parallel.mesh import make_mesh  # noqa: F401
from fem_tpu.parallel.ops import ShardedOperator  # noqa: F401
