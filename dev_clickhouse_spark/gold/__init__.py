from . import bridges, dims, facts, keys  # noqa: F401
