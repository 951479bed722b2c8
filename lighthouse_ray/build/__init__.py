from .builder import build_index

__all__ = ["build_index"]
