"""Serving layer (L4): HTTP endpoint + continuous-batching scheduler."""

from .scheduler import Completion, ContinuousBatchingEngine, Request
from .server import (
    BatchedInferenceServer,
    InferenceServer,
    ServerConfig,
    make_http_server,
)

__all__ = [
    "BatchedInferenceServer",
    "Completion",
    "ContinuousBatchingEngine",
    "InferenceServer",
    "Request",
    "ServerConfig",
    "make_http_server",
]
