"""Auth-cache staleness goldens — ports of the reference's serverauth tests
(extension/chqauthextension/serverauth_test.go:325-464):

  TestAuthenticateAPIKey_RevokedKeyDoesNotReturnStaleCache
  TestAuthenticateAPIKey_EmptyCustomerIDIsDenied
  TestAuthenticateAPIKey_TransientErrorFallsBackToCache
  TestAuthenticateAPIKey_5xxWithNoCacheFails
"""

from __future__ import annotations

import pytest

from cardinalhq_otel_collector_spark.operators.authcache import (
    AuthCache,
    AuthDenied,
    TransientAuthError,
    ValidateResponse,
)


class ScriptedValidator:
    """Replays a scripted sequence of responses/raises per call."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = 0

    def __call__(self, api_key: str) -> ValidateResponse:
        self.calls += 1
        item = self.script.pop(0)
        if isinstance(item, Exception):
            raise item
        return item


def test_revoked_key_never_served_stale():
    """serverauth_test.go:325 — a definitive denial replaces the cached
    valid entry at once; the revoked key cannot authenticate off stale
    cache even within the old TTL."""
    v = ScriptedValidator(
        [
            ValidateResponse("cust-1", "Customer One", True),
            ValidateResponse("", "", False),  # revocation
        ]
    )
    cache = AuthCache(validator=v, ttl_valid=100.0, ttl_invalid=10.0)
    ok = cache.authenticate("key-a", now=0.0)
    assert ok.customer_id == "cust-1"
    # TTL expires -> refresh sees the revocation -> denied, NOT stale-valid
    with pytest.raises(AuthDenied):
        cache.authenticate("key-a", now=200.0)
    # and the denial itself is cached (no extra validator call within TTL)
    with pytest.raises(AuthDenied):
        cache.authenticate("key-a", now=201.0)
    assert v.calls == 2


def test_empty_customer_id_is_denied():
    """serverauth_test.go:378 / serverauth.go:252-268 — valid:true with an
    empty customer_id is a contract violation treated as denial."""
    v = ScriptedValidator([ValidateResponse("", "Ghost", True)])
    cache = AuthCache(validator=v)
    with pytest.raises(AuthDenied):
        cache.authenticate("key-b", now=0.0)


def test_transient_error_serves_stale_entry():
    """serverauth_test.go:398/:426 — validator 5xx/network errors keep an
    EXPIRED valid entry serving (availability over freshness)."""
    v = ScriptedValidator(
        [
            ValidateResponse("cust-2", "Two", True),
            TransientAuthError("validator 503"),
            TransientAuthError("validator 503"),
        ]
    )
    cache = AuthCache(validator=v, ttl_valid=50.0)
    assert cache.authenticate("key-c", now=0.0).customer_id == "cust-2"
    stale = cache.authenticate("key-c", now=100.0)  # expired + transient
    assert stale.customer_id == "cust-2"
    # keeps serving across repeated transient failures
    assert cache.authenticate("key-c", now=200.0).customer_id == "cust-2"
    assert v.calls == 3


def test_transient_error_with_no_cache_fails():
    """serverauth_test.go:452 — no cached entry to fall back to → the
    transient error propagates."""
    v = ScriptedValidator([TransientAuthError("conn refused")])
    cache = AuthCache(validator=v)
    with pytest.raises(TransientAuthError):
        cache.authenticate("key-d", now=0.0)


def test_snapshot_enrich_marks_unknown_keys_denied(spark):
    """A16: the cache snapshot broadcast-joins into a row stream; unknown
    keys surface valid=false (the auth-denied analogue)."""
    v = ScriptedValidator([ValidateResponse("cust-9", "Nine", True)])
    cache = AuthCache(validator=v)
    cache.authenticate("key-e", now=0.0)
    rows = spark.createDataFrame(
        [("key-e", 1), ("key-unknown", 2)], "api_key string, payload int"
    )
    out = {r["api_key"]: r for r in cache.enrich(rows, now=1.0).collect()}
    assert out["key-e"]["valid"] is True
    assert out["key-e"]["customer_id"] == "cust-9"
    assert out["key-unknown"]["valid"] is False
    assert out["key-unknown"]["customer_id"] is None
