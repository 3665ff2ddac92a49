from .match import MatchResult, play_match, random_openings, elo_from_winrate
from .gsprt import GSPRT
from .spsa import SPSA

__all__ = [
    "MatchResult",
    "play_match",
    "random_openings",
    "elo_from_winrate",
    "GSPRT",
    "SPSA",
]
