from .selfplay import SelfplayConfig, GameRecord, SelfplayResult, play_games, make_targets

__all__ = ["SelfplayConfig", "GameRecord", "SelfplayResult", "play_games", "make_targets"]
