"""Tokenizer singleton for cosmetic decoding (L5).

Parity with the reference's ``globals.py:3-22`` (Singleton metaclass +
``Decoder`` used for verbose token printing in the algorithms). The engine
itself is ids-in/ids-out — the tokenizer is only attached at the harness /
serving layer (SURVEY.md §7.3 tokenizer split).
"""

from __future__ import annotations

from typing import Optional


class Singleton(type):
    _instances: dict = {}

    def __call__(cls, *args, **kwargs):
        if cls not in cls._instances:
            cls._instances[cls] = super().__call__(*args, **kwargs)
        return cls._instances[cls]


class Decoder(metaclass=Singleton):
    def __init__(self):
        self.tokenizer = None

    def set_tokenizer(self, tokenizer) -> None:
        self.tokenizer = tokenizer

    def encode(self, text: str, **kwargs):
        assert self.tokenizer is not None, "Decoder tokenizer not set"
        return self.tokenizer.encode(text, **kwargs)

    def decode(self, token_ids, **kwargs) -> str:
        assert self.tokenizer is not None, "Decoder tokenizer not set"
        return self.tokenizer.decode(list(token_ids), **kwargs)
