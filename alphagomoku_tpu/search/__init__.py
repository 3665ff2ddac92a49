from . import mcts, score

__all__ = ["mcts", "score"]
