from . import mcts, score, selectors, static_solver, vcf, vct, zobrist

__all__ = ["mcts", "score", "selectors", "static_solver", "vcf", "vct", "zobrist"]
