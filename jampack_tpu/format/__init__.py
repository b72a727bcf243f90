from . import constants, tables, varint, checksum, framing  # noqa: F401
