from .fdoct import FdOctModel  # noqa: F401
