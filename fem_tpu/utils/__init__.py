from fem_tpu.utils import smallmat  # noqa: F401
