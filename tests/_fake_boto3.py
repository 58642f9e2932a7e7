"""In-process fake of the boto3 surface ``S3Store`` touches.

The container has no network egress, so the S3 backend can never talk
to a real bucket here; this stub implements exactly the resource API
the adapter calls (``boto3.resource("s3")`` → Bucket → put_object /
Object().get()/delete() / objects.filter, plus
``meta.client.exceptions.NoSuchKey``) so the save / load / append /
delete / list / error-surfacing paths execute for real in tests.
Install with ``sys.modules["boto3"] = tests._fake_boto3`` (or
monkeypatch) before constructing an ``S3Store``.
"""

from __future__ import annotations

from typing import Dict

# bucket-name -> {key: bytes}; tests may inspect or pre-seed
BUCKETS: Dict[str, Dict[str, bytes]] = {}
# when set, the next Object.get() raises it (transient-outage fault
# injection for the error-surfacing path), then clears itself
FAIL_NEXT_GET: list = []


class _NoSuchKey(Exception):
    pass


class _Exceptions:
    NoSuchKey = _NoSuchKey


class _Client:
    exceptions = _Exceptions()


class _Meta:
    client = _Client()


class _Body:
    def __init__(self, data: bytes):
        self._data = data

    def read(self) -> bytes:
        return self._data


class _Object:
    def __init__(self, data: Dict[str, bytes], key: str):
        self._data = data
        self.key = key

    def get(self):
        if FAIL_NEXT_GET:
            raise FAIL_NEXT_GET.pop()
        if self.key not in self._data:
            raise _NoSuchKey(self.key)
        return {"Body": _Body(self._data[self.key])}

    def delete(self):  # S3 delete is idempotent
        self._data.pop(self.key, None)


class _ObjectCollection:
    def __init__(self, data: Dict[str, bytes]):
        self._data = data

    def filter(self, Prefix: str = ""):
        return [
            _Object(self._data, k)
            for k in sorted(self._data)
            if k.startswith(Prefix)
        ]


class _Bucket:
    def __init__(self, name: str):
        self._data = BUCKETS.setdefault(name, {})
        self.name = name
        self.objects = _ObjectCollection(self._data)

    def put_object(self, Key: str, Body: bytes):
        self._data[Key] = bytes(Body)

    def Object(self, key: str) -> _Object:
        return _Object(self._data, key)


class _Resource:
    meta = _Meta()

    def Bucket(self, name: str) -> _Bucket:
        return _Bucket(name)


def resource(service: str, **kwargs) -> _Resource:
    assert service == "s3", service
    return _Resource()
