from .match import MatchResult, play_match, random_openings, elo_from_winrate
from .gsprt import GSPRT
from .spsa import SPSA
from .tuner import EngineTuner, TunableParam, config_from_theta

__all__ = [
    "MatchResult",
    "play_match",
    "random_openings",
    "elo_from_winrate",
    "GSPRT",
    "SPSA",
    "EngineTuner",
    "TunableParam",
    "config_from_theta",
]
