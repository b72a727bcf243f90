from . import ans, bwt, filters, lpx, lz77, models, rank, rans, rle0  # noqa: F401
