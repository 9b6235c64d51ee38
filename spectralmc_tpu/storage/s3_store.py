"""S3/MinIO ObjectStore backend (requires aioboto3 — import-gated).

Parity: ``/root/reference/src/spectralmc/storage/store.py:238-251`` (env-
configured endpoint, connection pool, adaptive retries) and
``s3_operations.py:33-203`` (error classification into ADTs). Not importable
in this image (aioboto3 absent); reach it via
``object_store.make_s3_object_store`` which gates the import.
"""

from __future__ import annotations

import os

import aioboto3
from botocore.config import Config as BotoConfig
from botocore.exceptions import BotoCoreError, ClientError

from spectralmc_tpu.core.errors.storage import (
    AccessDenied,
    BucketNotFound,
    NetworkError,
    ObjectNotFound,
    PreconditionFailed,
    StoreOpError,
    Throttled,
    UnknownStoreError,
)
from spectralmc_tpu.core.result import Failure, Result, Success

_THROTTLE_CODES = {"SlowDown", "RequestLimitExceeded", "ServiceUnavailable", "Throttling"}


def _classify(exc: ClientError, bucket: str, key: str) -> StoreOpError:
    code = exc.response.get("Error", {}).get("Code", "")
    if code in ("NoSuchBucket",):
        return BucketNotFound(bucket=bucket)
    if code in ("NoSuchKey", "404", "NotFound"):
        return ObjectNotFound(bucket=bucket, key=key)
    if code in ("AccessDenied", "403"):
        return AccessDenied(bucket=bucket, key=key, reason=str(exc))
    if code in ("PreconditionFailed", "412"):
        return PreconditionFailed(bucket=bucket, key=key, expected_etag="")
    if code in _THROTTLE_CODES:
        return Throttled(bucket=bucket, key=key, code=code)
    return UnknownStoreError(bucket=bucket, key=key, reason=str(exc))


class S3ObjectStore:
    """aioboto3-backed ObjectStore with genuine If-Match/If-None-Match CAS."""

    def __init__(self, bucket: str, *, endpoint_url: str | None = None) -> None:
        self.bucket = bucket
        self._endpoint = endpoint_url or os.environ.get("AWS_ENDPOINT_URL")
        self._session = aioboto3.Session()
        self._config = BotoConfig(
            max_pool_connections=50, retries={"max_attempts": 3, "mode": "adaptive"}
        )

    def _client(self) -> "object":
        return self._session.client("s3", endpoint_url=self._endpoint, config=self._config)

    async def get(self, key: str) -> Result[tuple[bytes, str], StoreOpError]:
        try:
            async with self._client() as s3:
                resp = await s3.get_object(Bucket=self.bucket, Key=key)
                data = await resp["Body"].read()
                return Success((data, resp["ETag"].strip('"')))
        except ClientError as exc:
            return Failure(_classify(exc, self.bucket, key))
        except BotoCoreError as exc:
            return Failure(NetworkError(bucket=self.bucket, key=key, reason=str(exc)))

    async def put(
        self,
        key: str,
        data: bytes,
        *,
        if_match: str | None = None,
        if_none_match: bool = False,
    ) -> Result[str, StoreOpError]:
        kwargs: dict[str, object] = {"Bucket": self.bucket, "Key": key, "Body": data}
        if if_match is not None:
            kwargs["IfMatch"] = if_match
        if if_none_match:
            kwargs["IfNoneMatch"] = "*"
        try:
            async with self._client() as s3:
                resp = await s3.put_object(**kwargs)
                return Success(resp["ETag"].strip('"'))
        except ClientError as exc:
            return Failure(_classify(exc, self.bucket, key))
        except BotoCoreError as exc:
            return Failure(NetworkError(bucket=self.bucket, key=key, reason=str(exc)))

    async def delete(self, key: str) -> Result[None, StoreOpError]:
        try:
            async with self._client() as s3:
                await s3.delete_object(Bucket=self.bucket, Key=key)
                return Success(None)
        except ClientError as exc:
            return Failure(_classify(exc, self.bucket, key))
        except BotoCoreError as exc:
            return Failure(NetworkError(bucket=self.bucket, key=key, reason=str(exc)))

    async def list(self, prefix: str) -> Result[tuple[str, ...], StoreOpError]:
        keys: list[str] = []
        try:
            async with self._client() as s3:
                paginator = s3.get_paginator("list_objects_v2")
                async for page in paginator.paginate(Bucket=self.bucket, Prefix=prefix):
                    keys.extend(obj["Key"] for obj in page.get("Contents", ()))
            return Success(tuple(sorted(keys)))
        except ClientError as exc:
            return Failure(_classify(exc, self.bucket, prefix))
        except BotoCoreError as exc:
            return Failure(NetworkError(bucket=self.bucket, key=prefix, reason=str(exc)))

    async def head(self, key: str) -> Result[tuple[int, str], StoreOpError]:
        try:
            async with self._client() as s3:
                resp = await s3.head_object(Bucket=self.bucket, Key=key)
                return Success((resp["ContentLength"], resp["ETag"].strip('"')))
        except ClientError as exc:
            return Failure(_classify(exc, self.bucket, key))
        except BotoCoreError as exc:
            return Failure(NetworkError(bucket=self.bucket, key=key, reason=str(exc)))
