from .protocol import (
    InputListener,
    Message,
    MessageQueue,
    MessageType,
    OutputSender,
    Protocol,
)
from .gomocup import GomocupProtocol, ExtendedGomocupProtocol
from .engine import Engine, SearchSummary
from .time_manager import TimeManager, MovesLeftEstimator
from .manager import ProgramManager

__all__ = [
    "InputListener",
    "Message",
    "MessageQueue",
    "MessageType",
    "OutputSender",
    "Protocol",
    "GomocupProtocol",
    "ExtendedGomocupProtocol",
    "Engine",
    "SearchSummary",
    "TimeManager",
    "MovesLeftEstimator",
    "ProgramManager",
]
