"""Errors for the storage layer (parity: reference storage/s3_errors.py:11-98
and storage/errors.py:7-104, reshaped as frozen ADTs).

The object-store errors classify backend failures (missing bucket/object,
denied, throttled, network); the chain errors cover CAS conflicts and
corruption. Exceptions used for the few genuinely unexpected paths live in
``spectralmc_tpu.storage.exceptions``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union


# --- object-store operation errors ---------------------------------------


@dataclass(frozen=True, slots=True)
class BucketNotFound:
    bucket: str


@dataclass(frozen=True, slots=True)
class ObjectNotFound:
    bucket: str
    key: str


@dataclass(frozen=True, slots=True)
class AccessDenied:
    bucket: str
    key: str
    reason: str


@dataclass(frozen=True, slots=True)
class PreconditionFailed:
    bucket: str
    key: str
    expected_etag: str


@dataclass(frozen=True, slots=True)
class Throttled:
    bucket: str
    key: str
    code: str


@dataclass(frozen=True, slots=True)
class NetworkError:
    bucket: str
    key: str
    reason: str


@dataclass(frozen=True, slots=True)
class UnknownStoreError:
    bucket: str
    key: str
    reason: str


StoreOpError = Union[
    BucketNotFound,
    ObjectNotFound,
    AccessDenied,
    PreconditionFailed,
    Throttled,
    NetworkError,
    UnknownStoreError,
]


# --- chain-level errors ----------------------------------------------------


@dataclass(frozen=True, slots=True)
class NotFastForward:
    head_counter: int
    expected_counter: int
    reason: str


@dataclass(frozen=True, slots=True)
class ChainParseError:
    key: str
    reason: str


@dataclass(frozen=True, slots=True)
class VersionNotFound:
    identifier: str
    reason: str


@dataclass(frozen=True, slots=True)
class ChecksumError:
    expected: str
    actual: str


ChainError = Union[NotFastForward, ChainParseError, VersionNotFound, ChecksumError]
StorageError = Union[StoreOpError, ChainError]
