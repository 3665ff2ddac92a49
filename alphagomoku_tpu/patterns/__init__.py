from . import bitwise, defensive, features, tables

__all__ = ["bitwise", "defensive", "features", "tables"]
