from .hashing import hex_prefix_to_long_sql  # noqa: F401
