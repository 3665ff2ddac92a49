from . import augment, configs, logger, misc, selfcheck

__all__ = ["augment", "configs", "logger", "misc", "selfcheck"]
