from . import mcts, score, selectors, static_solver, vcf, zobrist

__all__ = ["mcts", "score", "selectors", "static_solver", "vcf", "zobrist"]
