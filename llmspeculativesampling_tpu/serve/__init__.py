"""Serving layer (L4): HTTP endpoint over the speculative engine."""

from .server import InferenceServer, ServerConfig, make_http_server

__all__ = ["InferenceServer", "ServerConfig", "make_http_server"]
