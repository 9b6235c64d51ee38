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


TrainerError = Union[InvalidTrainingConfig, CommitPlanMismatch, NonFiniteLoss, CheckpointMismatch]
