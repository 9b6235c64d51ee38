"""Errors for the deterministic key-stream (parity: reference errors/async_normals.py).

The reference's normal-generator errors (InvalidDType/InvalidShape/
SeedOutOfRange/QueueEmpty/QueueBusy, errors/async_normals.py:9-45) largely
covered stateful-stream failure modes; with stateless threefry keys only the
configuration errors survive.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union


@dataclass(frozen=True, slots=True)
class InvalidShape:
    rows: int
    cols: int
    reason: str


@dataclass(frozen=True, slots=True)
class SeedOutOfRange:
    seed: int
    reason: str


@dataclass(frozen=True, slots=True)
class InvalidCounter:
    counter: int
    reason: str


RngError = Union[InvalidShape, SeedOutOfRange, InvalidCounter]
