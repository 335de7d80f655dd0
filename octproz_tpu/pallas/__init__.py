from .fused_prep import build_prep_operator, fused_prep  # noqa: F401
