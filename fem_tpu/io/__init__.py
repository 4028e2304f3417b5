from fem_tpu.io import inp, vtk  # noqa: F401
