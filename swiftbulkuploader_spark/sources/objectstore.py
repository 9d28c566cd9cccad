"""Pluggable object-store sink (SURVEY.md §2.1 S6/S7/S8).

The reference PUTs files to OpenStack Swift with per-call auth and a global
token (bulkupload.py:35-77, 80-107); here the store is an interface with:

* `LocalFSObjectStore` — a local-filesystem fake for tests, with
  deterministic failure injection (fail the first N attempts of keys
  matching a substring) to exercise retry/resume paths.
* `SwiftObjectStore`  — the real thing, import-gated on python-swiftclient
  (not installed in this environment; the class documents the wiring and
  raises cleanly if constructed without the dependency).

Connections are made once per *partition* (upload stage), not once per call
like the reference (bulkupload.py:236, 247, 260); auth retry is capped
exponential backoff, not the reference's unbounded linear recursion
(bulkupload.py:94-107; SURVEY.md §7.4 item 9).

Writes are idempotent by key (same key overwrites), preserving the
reference's at-least-once + idempotent-PUT guarantee (SURVEY.md §2.7).
"""

from __future__ import annotations

import os
import time
from abc import ABC, abstractmethod


class ObjectStore(ABC):
    """Minimal sink contract used by the upload stage."""

    @abstractmethod
    def put(self, key: str, data: bytes) -> None:
        """Store bytes under key; overwrite-if-exists (idempotent)."""

    @abstractmethod
    def exists(self, key: str) -> bool: ...

    @abstractmethod
    def get(self, key: str) -> bytes: ...

    def close(self) -> None:  # pragma: no cover - default no-op
        pass


class StoreFactory:
    """Picklable factory: shipped to executors, builds one store per
    partition. Subclass or pass a callable via `make`."""

    def __init__(self, kind: str, **kwargs):
        self.kind = kind
        self.kwargs = kwargs

    def build(self) -> ObjectStore:
        if self.kind == "localfs":
            return LocalFSObjectStore(**self.kwargs)
        if self.kind == "swift":
            return SwiftObjectStore(**self.kwargs)
        raise ValueError(f"unknown store kind {self.kind!r}")


class LocalFSObjectStore(ObjectStore):
    """Local-FS fake: keys map to files under `root`. Failure injection:
    attempts on keys containing `fail_substring` raise IOError until that
    key has failed `fail_times` times (tracked via sentinel files so the
    count survives across processes/partitions). `auth_fail_times` injects
    CONSTRUCTION failures — the first N builds raise ConnectionError
    (counted atomically via O_EXCL sentinel files, so the total is exact
    even with partitions racing to connect), exercising the
    `connect_with_backoff` re-auth path the way Swift auth outages would
    (reference bulkupload.py:94-107)."""

    def __init__(self, root: str, fail_substring: str | None = None, fail_times: int = 0,
                 auth_fail_times: int = 0):
        self.root = root
        self.fail_substring = fail_substring
        self.fail_times = fail_times
        os.makedirs(root, exist_ok=True)
        if auth_fail_times:
            auth_dir = os.path.join(root, ".auth_failures")
            os.makedirs(auth_dir, exist_ok=True)
            for n in range(auth_fail_times):
                try:
                    fd = os.open(os.path.join(auth_dir, f"attempt-{n}"),
                                 os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                except FileExistsError:
                    continue  # this injected failure already spent
                os.close(fd)
                raise ConnectionError(
                    f"injected auth failure {n + 1}/{auth_fail_times}"
                )

    def _path(self, key: str) -> str:
        safe = key.lstrip("/")
        if ".." in safe.split("/"):
            raise ValueError(f"unsafe key {key!r}")
        return os.path.join(self.root, safe)

    def _maybe_fail(self, key: str) -> None:
        if not self.fail_substring or self.fail_substring not in key:
            return
        marker_dir = os.path.join(self.root, ".failures")
        os.makedirs(marker_dir, exist_ok=True)
        marker = os.path.join(marker_dir, key.replace("/", "%2F") + ".count")
        n = 0
        if os.path.exists(marker):
            with open(marker) as fh:
                n = int(fh.read() or 0)
        if n < self.fail_times:
            with open(marker, "w") as fh:
                fh.write(str(n + 1))
            raise IOError(f"injected failure {n + 1}/{self.fail_times} for {key}")

    def put(self, key: str, data: bytes) -> None:
        self._maybe_fail(key)
        p = self._path(key)
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, p)  # atomic: readers never see partial writes

    def exists(self, key: str) -> bool:
        return os.path.isfile(self._path(key))

    def get(self, key: str) -> bytes:
        with open(self._path(key), "rb") as fh:
            return fh.read()


def connect_with_backoff(connect, max_attempts: int = 6, base_sleep: float = 0.5,
                         max_sleep: float = 30.0, sleep=None):
    """Capped exponential backoff around a connection factory (replaces the
    reference's unbounded linear-backoff recursion, bulkupload.py:94-107).

    Sleeps base_sleep * 2^attempt, capped at max_sleep, between attempts —
    and NOT after the final failure (a terminal error should surface
    immediately, not after one more nap). `sleep` is injectable so tests
    can assert the exact schedule without wall-clock waits; the default
    resolves time.sleep at call time so monkeypatching works too."""
    last: Exception | None = None
    for attempt in range(max_attempts):
        try:
            return connect()
        except Exception as e:  # noqa: BLE001 - deliberate: retry any connect error
            last = e
            if attempt < max_attempts - 1:
                (sleep or time.sleep)(min(base_sleep * (2**attempt), max_sleep))
    raise ConnectionError(f"auth failed after {max_attempts} attempts: {last}")


class SwiftObjectStore(ObjectStore):
    """OpenStack Swift sink (reference parity: bulkupload.py:58-64, 110-124).

    Import-gated: python-swiftclient is not available in this environment,
    so construction raises ImportError with the wiring documented. One
    instance per partition; token acquired via `connect_with_backoff` at
    construction and REFRESHED on an expired-token PUT (http 401) — the
    reference re-authenticates and retries a failed upload the same way
    (bulkupload.py:80-107), but there via unbounded linear recursion;
    here one re-auth (itself backoff-capped) then one retry, and any
    second failure surfaces to the upload stage's own attempt accounting.

    Call shapes (pinned by tests/test_swift_contract.py against a stubbed
    swiftclient module):
      get_auth(auth_url, username, password, auth_version="3")
      put_container(url, token, container)           # create-if-absent
      put_object(url, token, container, key, data)
      head_object(url, token, container, key)        # exists probe
    """

    def __init__(self, auth_url: str, username: str, password: str, container: str,
                 tenant: str | None = None):
        try:
            import swiftclient.client as swift  # type: ignore[import-not-found]
        except ImportError as e:  # pragma: no cover - dep not in container
            raise ImportError(
                "python-swiftclient is required for SwiftObjectStore; "
                "install it or use LocalFSObjectStore"
            ) from e
        self._swift = swift
        self.container = container

        def _connect():
            return swift.get_auth(auth_url, username, password, auth_version="3")

        self._connect = _connect
        self.url, self.token = connect_with_backoff(_connect)
        swift.put_container(self.url, self.token, container)  # create-if-absent

    def _is_auth_error(self, e: Exception) -> bool:
        return getattr(e, "http_status", None) == 401

    def put(self, key: str, data: bytes) -> None:
        try:
            self._swift.put_object(self.url, self.token, self.container, key, data)
        except self._swift.ClientException as e:
            if not self._is_auth_error(e):
                raise
            # expired token: re-auth (backoff-capped) and retry ONCE with
            # the fresh token (reference bulkupload.py:80-107)
            self.url, self.token = connect_with_backoff(self._connect)
            self._swift.put_object(self.url, self.token, self.container, key, data)

    def exists(self, key: str) -> bool:
        try:
            self._swift.head_object(self.url, self.token, self.container, key)
            return True
        except self._swift.ClientException:
            return False

    def get(self, key: str) -> bytes:
        _, body = self._swift.get_object(self.url, self.token, self.container, key)
        return body
