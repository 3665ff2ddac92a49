from .networks import (
    AGNetwork,
    ModelConfig,
    NetOutput,
    NetEval,
    create_network,
    list_architectures,
    postprocess,
    value_expectation,
)

__all__ = [
    "AGNetwork",
    "ModelConfig",
    "NetOutput",
    "NetEval",
    "create_network",
    "list_architectures",
    "postprocess",
    "value_expectation",
]
