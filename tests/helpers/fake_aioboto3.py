"""A faithful in-process fake of the aioboto3/botocore surface s3_store uses.

The reference integration-tests its storage layer against live MinIO with
per-test buckets (``/root/reference/tests/conftest.py:174-229``,
``tests/test_storage/test_atomic_cas.py:14-50``). This image has neither
MinIO nor boto, so this module emulates **real S3 semantics** for the exact
client subset ``spectralmc_tpu/storage/s3_store.py`` consumes:

* ETags are ``'"<md5-hex>"'`` of the body (simple PUT semantics).
* ``get_object``/``head_object`` on a missing key raise ``ClientError`` with
  codes ``NoSuchKey`` / ``404`` respectively (S3 HEAD has no body, so boto
  surfaces the bare status code).
* Conditional writes follow the S3 conditional-write API (If-None-Match
  ``*`` — GA Nov 2024 — and If-Match on PUT): ``PreconditionFailed`` (412)
  on ETag mismatch or existing-key create; If-Match against a missing key is
  S3's ``NoSuchKey`` (404).
* ``delete_object`` is idempotent; missing buckets raise ``NoSuchBucket``.
* ``get_paginator("list_objects_v2")`` yields pages of ``Contents`` in
  lexicographic key order (1000 keys/page like S3).

Fault injection (`inject`) arms throttle (``SlowDown`` etc.) or network
(``BotoCoreError``) failures per (operation, key substring) so the retry
engine and error classifier can be driven through the real code path.

``install(monkeypatch)`` mounts the fake under ``sys.modules`` as
``aioboto3``/``botocore`` so ``spectralmc_tpu.storage.s3_store`` imports it
verbatim — the production module is tested unmodified.
"""

from __future__ import annotations

import hashlib
import importlib
import sys
import types
from dataclasses import dataclass, field

# --------------------------------------------------------------------------
# botocore stand-ins
# --------------------------------------------------------------------------


class BotoCoreError(Exception):
    """Base for transport-level failures (parity: botocore.exceptions)."""


class ClientError(Exception):
    """Service error carrying the S3 error-code response shape."""

    def __init__(self, response: dict, operation_name: str) -> None:
        code = response.get("Error", {}).get("Code", "Unknown")
        super().__init__(f"{operation_name} failed: {code}")
        self.response = response
        self.operation_name = operation_name


class EndpointConnectionError(BotoCoreError):
    pass


class Config:
    """botocore.config.Config — stores kwargs, enforces nothing."""

    def __init__(self, **kwargs: object) -> None:
        self.kwargs = kwargs


def _client_error(code: str, operation: str, message: str = "") -> ClientError:
    return ClientError(
        {"Error": {"Code": code, "Message": message or code}}, operation
    )


# --------------------------------------------------------------------------
# The in-memory S3 service (module-level so the installed fake and the test
# share state; reset() between tests)
# --------------------------------------------------------------------------


def _etag(data: bytes) -> str:
    return hashlib.md5(data).hexdigest()


@dataclass
class _Fault:
    operation: str  # "get" | "put" | "delete" | "head" | "list" | "*"
    key_substring: str
    error: Exception
    remaining: int


@dataclass
class _Service:
    buckets: dict[str, dict[str, bytes]] = field(default_factory=dict)
    faults: list[_Fault] = field(default_factory=list)
    call_log: list[tuple[str, str]] = field(default_factory=list)


SERVICE = _Service()
PAGE_SIZE = 1000


def reset() -> None:
    SERVICE.buckets.clear()
    SERVICE.faults.clear()
    SERVICE.call_log.clear()


def create_bucket(name: str) -> None:
    SERVICE.buckets.setdefault(name, {})


def inject(operation: str, key_substring: str, error: Exception, times: int = 1) -> None:
    """Arm ``error`` for the next ``times`` matching calls."""
    SERVICE.faults.append(
        _Fault(operation=operation, key_substring=key_substring, error=error, remaining=times)
    )


def throttle_error(code: str = "SlowDown") -> ClientError:
    return _client_error(code, "PutObject", "Reduce your request rate")


def network_error() -> BotoCoreError:
    return EndpointConnectionError("Could not connect to the endpoint URL")


def _check_faults(operation: str, key: str) -> None:
    for fault in SERVICE.faults:
        if fault.remaining <= 0:
            continue
        if fault.operation not in ("*", operation):
            continue
        if fault.key_substring not in key:
            continue
        fault.remaining -= 1
        raise fault.error


def _bucket(name: str, operation: str) -> dict[str, bytes]:
    bucket = SERVICE.buckets.get(name)
    if bucket is None:
        raise _client_error("NoSuchBucket", operation)
    return bucket


class _Body:
    def __init__(self, data: bytes) -> None:
        self._data = data

    async def read(self) -> bytes:
        return self._data


class _Paginator:
    def __init__(self, bucket_name: str) -> None:
        self._bucket_name = bucket_name

    def paginate(self, *, Bucket: str, Prefix: str = "", **_: object):
        async def _pages():
            _check_faults("list", Prefix)
            SERVICE.call_log.append(("list", Prefix))
            bucket = _bucket(Bucket, "ListObjectsV2")
            keys = sorted(k for k in bucket if k.startswith(Prefix))
            if not keys:
                yield {}
                return
            for start in range(0, len(keys), PAGE_SIZE):
                yield {
                    "Contents": [{"Key": k} for k in keys[start : start + PAGE_SIZE]]
                }

        return _pages()


class _FakeS3Client:
    async def __aenter__(self) -> "_FakeS3Client":
        return self

    async def __aexit__(self, *exc: object) -> None:
        return None

    async def get_object(self, *, Bucket: str, Key: str) -> dict:
        _check_faults("get", Key)
        SERVICE.call_log.append(("get", Key))
        bucket = _bucket(Bucket, "GetObject")
        data = bucket.get(Key)
        if data is None:
            raise _client_error("NoSuchKey", "GetObject")
        return {"Body": _Body(data), "ETag": f'"{_etag(data)}"'}

    async def put_object(
        self,
        *,
        Bucket: str,
        Key: str,
        Body: bytes,
        IfMatch: str | None = None,
        IfNoneMatch: str | None = None,
        **_: object,
    ) -> dict:
        _check_faults("put", Key)
        SERVICE.call_log.append(("put", Key))
        bucket = _bucket(Bucket, "PutObject")
        current = bucket.get(Key)
        if IfNoneMatch is not None:
            if IfNoneMatch != "*":
                raise _client_error("NotImplemented", "PutObject", "only If-None-Match: *")
            if current is not None:
                raise _client_error("PreconditionFailed", "PutObject")
        if IfMatch is not None:
            if current is None:
                # real S3: If-Match against a missing object is 404 NoSuchKey
                raise _client_error("NoSuchKey", "PutObject")
            if _etag(current) != IfMatch.strip('"'):
                raise _client_error("PreconditionFailed", "PutObject")
        data = bytes(Body)
        bucket[Key] = data
        return {"ETag": f'"{_etag(data)}"'}

    async def delete_object(self, *, Bucket: str, Key: str) -> dict:
        _check_faults("delete", Key)
        SERVICE.call_log.append(("delete", Key))
        bucket = _bucket(Bucket, "DeleteObject")
        bucket.pop(Key, None)  # S3 delete is idempotent (204 either way)
        return {}

    async def head_object(self, *, Bucket: str, Key: str) -> dict:
        _check_faults("head", Key)
        SERVICE.call_log.append(("head", Key))
        bucket = _bucket(Bucket, "HeadObject")
        data = bucket.get(Key)
        if data is None:
            # boto surfaces HEAD misses as the bare status code (no XML body)
            raise _client_error("404", "HeadObject")
        return {"ContentLength": len(data), "ETag": f'"{_etag(data)}"'}

    def get_paginator(self, name: str) -> _Paginator:
        if name != "list_objects_v2":
            raise ValueError(f"unsupported paginator {name}")
        return _Paginator(name)


class Session:
    """aioboto3.Session stand-in."""

    def __init__(self, **_: object) -> None:
        pass

    def client(self, service: str, **_: object) -> _FakeS3Client:
        if service != "s3":
            raise ValueError(f"unsupported service {service}")
        return _FakeS3Client()


# --------------------------------------------------------------------------
# sys.modules mounting
# --------------------------------------------------------------------------


def install(monkeypatch) -> types.ModuleType:
    """Mount the fake as ``aioboto3``/``botocore`` and (re)import s3_store.

    Returns the freshly imported ``spectralmc_tpu.storage.s3_store`` module,
    whose module-level ``aioboto3``/``botocore`` names are bound to this
    fake. State is shared through module-level ``SERVICE``; call ``reset()``
    per test.
    """
    aioboto3_mod = types.ModuleType("aioboto3")
    aioboto3_mod.Session = Session

    botocore_mod = types.ModuleType("botocore")
    config_mod = types.ModuleType("botocore.config")
    config_mod.Config = Config
    exceptions_mod = types.ModuleType("botocore.exceptions")
    exceptions_mod.BotoCoreError = BotoCoreError
    exceptions_mod.ClientError = ClientError
    exceptions_mod.EndpointConnectionError = EndpointConnectionError
    botocore_mod.config = config_mod
    botocore_mod.exceptions = exceptions_mod

    monkeypatch.setitem(sys.modules, "aioboto3", aioboto3_mod)
    monkeypatch.setitem(sys.modules, "botocore", botocore_mod)
    monkeypatch.setitem(sys.modules, "botocore.config", config_mod)
    monkeypatch.setitem(sys.modules, "botocore.exceptions", exceptions_mod)

    # (re)import the production module against the fake; drop any cached copy
    sys.modules.pop("spectralmc_tpu.storage.s3_store", None)
    s3_store = importlib.import_module("spectralmc_tpu.storage.s3_store")
    # hand lifetime management to monkeypatch: the entry did not exist before
    # this call, so teardown DELETES it — no fake-bound module can leak into
    # later tests that import s3_store.
    sys.modules.pop("spectralmc_tpu.storage.s3_store")
    monkeypatch.setitem(sys.modules, "spectralmc_tpu.storage.s3_store", s3_store)
    return s3_store
