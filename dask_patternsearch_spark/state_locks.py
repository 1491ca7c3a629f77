"""Reference state-dir lock provider for object storage (round-13,
round-12 verdict #4).

The default state-dir writer lock (``operators.dedup._path_lock``) needs
O_EXCL creation, mtime heartbeats and atomic rename -- POSIX/NFSv4
semantics that object stores do not give.  What S3/GCS/Azure DO give is
**conditional put**: a write that succeeds only if the object's current
generation matches an expected one (S3 ``If-Match``/``If-None-Match`` on
ETags, GCS ``ifGenerationMatch``, Azure blob leases).  This module
implements the writer lease on exactly that primitive, behind the
``operators.dedup.set_state_lock_provider`` hook:

    from dask_patternsearch_spark.state_locks import (
        conditional_put_lock_provider)
    dedup.set_state_lock_provider(
        conditional_put_lock_provider(MyS3Store(bucket)))

Semantics mirror the file lock's, hazard for hazard:

- ACQUIRE: create-only put of a lease record ``{token, deadline}``
  (succeeds for exactly one of any number of racing acquirers); an
  EXPIRED lease is stolen by a conditional put fenced on the exact
  generation observed expired -- a fresh lease acquired between the
  observation and the steal makes the precondition fail, so a LIVE
  lease can never be displaced (the file lock's token-verified
  ``os.replace`` steal, expressed as CAS).
- HEARTBEAT: a daemon thread renews the deadline every
  ``stale_after/4`` s with a put fenced on our own last generation, so
  a live holder -- however slow -- never expires; a renewal whose
  precondition fails means the lease was stolen while this process was
  suspended: the holder is DISPOSSESSED, its ``owned()`` probe goes
  false, and the commit-time fail-stop (``_verify_owned`` ->
  ``StateLockLost``) keeps it from committing over the usurper.
- RELEASE: a delete fenced on our last generation; a dispossessed
  holder's delete precondition fails and the usurper's lease is left
  alone.

CLOCK CAVEAT (standard for client-driven leases, document per
deployment): expiry compares the stored deadline against the READER's
clock, so lease safety assumes bounded clock skew between writers --
size ``stale_after`` well above the skew bound (the default 60 s is
ample for NTP-disciplined fleets).  The fencing itself (generation CAS)
is skew-independent: a wrong clock can only delay or prematurely
ATTEMPT a steal, and a premature attempt still fences on the
generation, dispossessing the slow holder rather than corrupting state
-- the same fail-stop the file lock gives a SIGSTOPed holder.

``InMemoryConditionalStore`` is the reference store double: the exact
conditional-put contract, thread-safe, with an ``interpose`` hook so
tests can inject races into the get->put window.  Production stores
implement the same three methods over their native conditional
primitives.
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from contextlib import contextmanager


class InMemoryConditionalStore:
    """A conditional-put KV store: the object-store primitive the lease
    builds on, as an in-process reference implementation (and test
    double -- ``interpose(op, key)`` is called before each mutation
    commits, letting a test schedule a competing write inside the
    get->put race window).

    Contract (what a production S3/GCS adapter must provide):

    - ``get(key) -> (value, etag) | None``
    - ``put_if(key, value, expected_etag) -> etag | None`` --
      ``expected_etag=None`` means CREATE-ONLY (fails if the key
      exists); otherwise the put succeeds iff the key's current etag
      equals ``expected_etag``.  Returns the new etag, or None on
      precondition failure.
    - ``delete_if(key, expected_etag) -> bool`` -- delete iff the etag
      matches.
    """

    def __init__(self, interpose=None) -> None:
        self._data: dict[str, tuple[bytes, str]] = {}
        self._mu = threading.Lock()
        self.interpose = interpose

    def get(self, key: str):
        with self._mu:
            return self._data.get(key)

    def put_if(self, key: str, value: bytes, expected_etag):
        if self.interpose is not None:
            self.interpose("put_if", key)
        with self._mu:
            cur = self._data.get(key)
            if expected_etag is None:
                if cur is not None:
                    return None
            elif cur is None or cur[1] != expected_etag:
                return None
            etag = uuid.uuid4().hex
            self._data[key] = (bytes(value), etag)
            return etag

    def delete_if(self, key: str, expected_etag) -> bool:
        if self.interpose is not None:
            self.interpose("delete_if", key)
        with self._mu:
            cur = self._data.get(key)
            if cur is None or cur[1] != expected_etag:
                return False
            del self._data[key]
            return True


class _LeaseHandle:
    """What the provider's context manager yields: ``owned()`` is
    authoritative (re-reads the store and compares the lease token), so
    ``operators.dedup._verify_owned`` fail-stops a dispossessed holder
    at every commit point exactly as with the file lock."""

    __slots__ = ("path", "_store", "_key", "_token")

    def __init__(self, store, key: str, token: str) -> None:
        self.path = key  # what StateLockLost messages show
        self._store = store
        self._key = key
        self._token = token

    def owned(self) -> bool:
        cur = self._store.get(self._key)
        if cur is None:
            return False
        try:
            return json.loads(cur[0])["token"] == self._token
        except (ValueError, KeyError):
            return False


def conditional_put_lock_provider(store, *, clock=time.time,
                                  poll: float = 0.05):
    """A ``set_state_lock_provider``-compatible factory over any object
    implementing the :class:`InMemoryConditionalStore` contract.
    ``clock`` is injectable for tests (and must be shared-epoch across
    writers in production -- see the module clock caveat)."""

    @contextmanager
    def provider(state_dir: str, stale_after: float = 60.0):
        key = state_dir.rstrip("/") + "/.state_lease"
        token = uuid.uuid4().hex

        def record() -> bytes:
            return json.dumps(
                {"token": token, "deadline": clock() + stale_after}
            ).encode()

        etag: str | None = None
        while etag is None:
            cur = store.get(key)
            if cur is None:
                etag = store.put_if(key, record(), None)  # create-only
                continue
            value, cur_etag = cur
            try:
                deadline = json.loads(value)["deadline"]
            except (ValueError, KeyError):
                deadline = 0.0  # corrupt lease: treat as expired
            if clock() > deadline:
                # steal fenced on the exact generation observed expired:
                # a fresh lease acquired in between fails the CAS
                etag = store.put_if(key, record(), cur_etag)
                continue
            time.sleep(poll)

        state = {"etag": etag}
        stop = threading.Event()

        def heartbeat() -> None:
            while not stop.wait(stale_after / 4.0):
                new = store.put_if(key, record(), state["etag"])
                if new is None:
                    # stolen while suspended: dispossessed.  Unlike the
                    # file lock there is no transient-displacement
                    # restore in CAS-land -- once the generation moved,
                    # ownership is gone for good; owned() reads false
                    # and the commit fail-stop takes it from here.
                    return
                state["etag"] = new

        hb = threading.Thread(target=heartbeat,
                              name="state-lease-heartbeat", daemon=True)
        hb.start()
        try:
            yield _LeaseHandle(store, key, token)
        finally:
            stop.set()
            hb.join()
            # fenced release: never deletes a usurper's lease
            store.delete_if(key, state["etag"])

    return provider
