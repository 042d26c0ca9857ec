"""Utility sidecars (L5): tokenizer singleton, power observability."""

from .decoder import Decoder, Singleton
from .power import PowerMonitor

__all__ = ["Decoder", "Singleton", "PowerMonitor"]
