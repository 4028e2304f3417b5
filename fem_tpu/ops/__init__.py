from fem_tpu.ops import elements  # noqa: F401
