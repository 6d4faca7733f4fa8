from . import eo, group, linalg, shifts  # noqa: F401
