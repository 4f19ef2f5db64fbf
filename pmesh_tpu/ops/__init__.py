from . import kernels, paint, fft  # noqa: F401
