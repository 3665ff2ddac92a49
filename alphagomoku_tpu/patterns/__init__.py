from . import bitwise, features, tables

__all__ = ["bitwise", "features", "tables"]
