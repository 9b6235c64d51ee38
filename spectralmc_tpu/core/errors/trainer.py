"""Errors for the trainer (parity: reference errors/trainer.py)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union


@dataclass(frozen=True, slots=True)
class InvalidTrainingConfig:
    field: str
    value: object
    reason: str


@dataclass(frozen=True, slots=True)
class CommitPlanMismatch:
    reason: str


@dataclass(frozen=True, slots=True)
class NonFiniteLoss:
    step: int
    loss: float
    reason: str


@dataclass(frozen=True, slots=True)
class CheckpointMismatch:
    field: str
    reason: str


@dataclass(frozen=True, slots=True)
class EngineMismatch:
    """A checkpoint's recorded MC engine cannot be honored on this backend.

    The Pallas and XLA engines draw different bit streams, so resuming a
    mid-stream checkpoint on the wrong engine silently changes the normals —
    this failure makes the mismatch loud (resume with
    ``allow_engine_fallback=True`` to accept the stream break explicitly).
    """

    requested: str
    effective: str
    reason: str


TrainerError = Union[
    InvalidTrainingConfig, CommitPlanMismatch, NonFiniteLoss, CheckpointMismatch, EngineMismatch
]
