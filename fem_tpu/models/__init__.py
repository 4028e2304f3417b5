from fem_tpu.models.problem import Block, Problem  # noqa: F401
