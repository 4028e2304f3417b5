from fem_tpu.solver import cg, direct, newton, stepper  # noqa: F401
