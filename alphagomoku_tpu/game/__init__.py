from . import board, game, rules, types, vectorized

__all__ = ["board", "game", "rules", "types", "vectorized"]
