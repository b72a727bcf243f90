from . import ibwt, rans_decode, sa  # noqa: F401
