"""Mock-swiftclient contract test (round-7 verdict ask #7): the real
SwiftObjectStore wiring had never been exercised against even a stubbed
swiftclient API surface — the localfs fake carries all e2e coverage. This
module injects a fake ``swiftclient`` package into sys.modules and pins:

* the get_auth call shape (auth_url, username, password, auth_version="3")
  — reference bulkupload.py:58-64;
* create-if-absent put_container(url, token, container) at construction;
* put_object(url, token, container, key, data) — the exact positional
  shape the reference uses (bulkupload.py:110-124);
* capped-exponential retry of auth at construction (connect_with_backoff
  replaces the reference's unbounded linear recursion, bulkupload.py:94-107);
* re-auth + single retry with the FRESH token on an expired-token (401)
  put, and pass-through of non-auth errors;
* head_object-based exists() True/False on ClientException.

No Spark session needed — pure driver-side unit test.
"""

from __future__ import annotations

import sys
import types

import pytest

from swiftbulkuploader_spark.sources import objectstore as om


class FakeClientException(Exception):
    def __init__(self, msg="client error", http_status=None):
        super().__init__(msg)
        self.http_status = http_status


class FakeSwift:
    """Recording stub of the swiftclient.client surface the store uses."""

    def __init__(self, auth_failures=0, put_behaviors=None):
        self.calls: list[tuple] = []
        self.auth_failures = auth_failures
        self._auth_count = 0
        # per-call scripted behaviors for put_object: list of None (succeed)
        # or an exception instance to raise; exhausted -> succeed
        self.put_behaviors = list(put_behaviors or [])
        self.ClientException = FakeClientException

    def get_auth(self, auth_url, username, password, auth_version=None):
        self.calls.append(("get_auth", auth_url, username, password, auth_version))
        self._auth_count += 1
        if self._auth_count <= self.auth_failures:
            raise FakeClientException("auth down", http_status=503)
        return (f"http://store/v1/acct", f"token-{self._auth_count}")

    def put_container(self, url, token, container):
        self.calls.append(("put_container", url, token, container))

    def put_object(self, url, token, container, key, data):
        self.calls.append(("put_object", url, token, container, key, data))
        if self.put_behaviors:
            beh = self.put_behaviors.pop(0)
            if beh is not None:
                raise beh

    def head_object(self, url, token, container, key):
        self.calls.append(("head_object", url, token, container, key))
        if key.endswith("missing"):
            raise FakeClientException("not found", http_status=404)

    def get_object(self, url, token, container, key):
        self.calls.append(("get_object", url, token, container, key))
        return ({}, b"body-of-" + key.encode())


@pytest.fixture
def fake_swift(monkeypatch):
    """Install a recording swiftclient stub and neutralize backoff sleeps."""
    fake = FakeSwift()
    pkg = types.ModuleType("swiftclient")
    client = types.ModuleType("swiftclient.client")
    for name in ("get_auth", "put_container", "put_object", "head_object",
                 "get_object"):
        setattr(client, name, getattr(fake, name))
    client.ClientException = FakeClientException
    pkg.client = client
    monkeypatch.setitem(sys.modules, "swiftclient", pkg)
    monkeypatch.setitem(sys.modules, "swiftclient.client", client)
    fake.sleeps: list[float] = []
    monkeypatch.setattr(om.time, "sleep", fake.sleeps.append)
    return fake


def _build(fake, **kw):
    args = dict(auth_url="https://auth.example/v3", username="acct:user",
                password="pw", container="bulk")
    args.update(kw)
    return om.SwiftObjectStore(**args)


def test_construction_auth_and_container_shape(fake_swift):
    store = _build(fake_swift)
    assert fake_swift.calls[0] == (
        "get_auth", "https://auth.example/v3", "acct:user", "pw", "3")
    assert fake_swift.calls[1] == (
        "put_container", "http://store/v1/acct", "token-1", "bulk")
    assert (store.url, store.token) == ("http://store/v1/acct", "token-1")


def test_auth_retries_with_capped_exponential_backoff(fake_swift):
    fake_swift.auth_failures = 2
    store = _build(fake_swift)
    auths = [c for c in fake_swift.calls if c[0] == "get_auth"]
    assert len(auths) == 3  # two failures + the success
    assert store.token == "token-3"
    # connect_with_backoff schedule: 0.5 * 2^attempt between attempts
    assert fake_swift.sleeps == [0.5, 1.0]


def test_auth_gives_up_after_cap(fake_swift):
    fake_swift.auth_failures = 99
    with pytest.raises(ConnectionError, match="after 6 attempts"):
        _build(fake_swift)
    assert len([c for c in fake_swift.calls if c[0] == "get_auth"]) == 6
    # no sleep after the terminal failure
    assert len(fake_swift.sleeps) == 5


def test_put_object_call_shape(fake_swift):
    store = _build(fake_swift)
    store.put("d01/f00001.bin", b"\x00\x01")
    assert fake_swift.calls[-1] == (
        "put_object", "http://store/v1/acct", "token-1", "bulk",
        "d01/f00001.bin", b"\x00\x01")


def test_put_reauths_once_on_401_and_retries_with_fresh_token(fake_swift):
    fake_swift.put_behaviors = [FakeClientException("expired", http_status=401)]
    store = _build(fake_swift)
    store.put("k", b"v")
    tail = fake_swift.calls[2:]  # after construction's get_auth+put_container
    assert [c[0] for c in tail] == ["put_object", "get_auth", "put_object"]
    # the retry must carry the REFRESHED token, and the store keeps it
    assert tail[0][2] == "token-1"
    assert tail[2][2] == "token-2"
    assert store.token == "token-2"


def test_put_non_auth_error_propagates_without_reauth(fake_swift):
    fake_swift.put_behaviors = [FakeClientException("boom", http_status=500)]
    store = _build(fake_swift)
    with pytest.raises(FakeClientException):
        store.put("k", b"v")
    assert [c[0] for c in fake_swift.calls].count("get_auth") == 1


def test_put_failing_again_after_reauth_surfaces(fake_swift):
    fake_swift.put_behaviors = [
        FakeClientException("expired", http_status=401),
        FakeClientException("still broken", http_status=401),
    ]
    store = _build(fake_swift)
    with pytest.raises(FakeClientException, match="still broken"):
        store.put("k", b"v")
    # exactly one re-auth: the second failure is the upload stage's problem
    assert [c[0] for c in fake_swift.calls].count("get_auth") == 2


def test_exists_via_head_object(fake_swift):
    store = _build(fake_swift)
    assert store.exists("present-key") is True
    assert store.exists("key-missing") is False
    heads = [c for c in fake_swift.calls if c[0] == "head_object"]
    assert heads == [
        ("head_object", "http://store/v1/acct", "token-1", "bulk", "present-key"),
        ("head_object", "http://store/v1/acct", "token-1", "bulk", "key-missing"),
    ]


def test_get_returns_body(fake_swift):
    store = _build(fake_swift)
    assert store.get("k1") == b"body-of-k1"


def test_store_factory_builds_swift(fake_swift):
    factory = om.StoreFactory(
        "swift", auth_url="https://auth.example/v3", username="u",
        password="p", container="c")
    store = factory.build()
    assert isinstance(store, om.SwiftObjectStore)
    assert store.container == "c"
