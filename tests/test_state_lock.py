"""Commit-lock protocol: atomic stale-lock stealing, heartbeat leases,
lock-serialized ingest, and the explicit legacy-stamp migration.

These lock the round-10 hardening findings in place: the old breaker
unlinked a lock it had not atomically claimed, so two past-deadline
waiters could put two committers inside the read-modify-write and
silently drop stamps -- the exact lost-stamp hazard the lock exists to
prevent.
"""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from dask_patternsearch_spark.operators import dedup


def _plant_stale_lock(state_dir: str, age: float = 3600.0) -> str:
    os.makedirs(state_dir, exist_ok=True)
    lock = dedup._stamp_ledger_path(state_dir) + ".lock"
    with open(lock, "w") as fh:
        fh.write("dead-pid")
    old = time.time() - age
    os.utime(lock, (old, old))
    return lock


def test_stale_lock_steal_is_atomic_across_committers(tmp_path):
    """A planted crashed-holder lock plus MANY racing committers: exactly
    one steals (os.replace is atomic), every stamp survives, and no lock
    debris remains.  Under the old unlink-based breaker a loser could
    unlink a freshly re-created LIVE lock, letting two committers into
    the read-modify-write and dropping stamps."""
    state = str(tmp_path / "state")
    _plant_stale_lock(state)
    n = 8
    errs: list[BaseException] = []

    def commit(i: int) -> None:
        try:
            dedup._record_applied(state, f"stamp-{i}")
        except BaseException as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=commit, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not errs
    with open(dedup._stamp_ledger_path(state)) as fh:
        stamps = set(json.load(fh))
    assert stamps == {f"stamp-{i}" for i in range(n)}
    lock = dedup._stamp_ledger_path(state) + ".lock"
    assert not os.path.exists(lock)
    # steal tombstones are cleaned up too
    assert not [p for p in os.listdir(state) if ".steal-" in p]


def test_crashed_holder_lock_stolen_without_waiting(tmp_path):
    """Staleness is the LOCK FILE's age, not the waiter's arrival time: a
    fresh waiter facing an hours-old lock steals immediately instead of
    serving its own 60 s deadline."""
    state = str(tmp_path / "state")
    _plant_stale_lock(state)
    t0 = time.time()
    dedup._record_applied(state, "s1")
    assert time.time() - t0 < 10.0
    with open(dedup._stamp_ledger_path(state)) as fh:
        assert json.load(fh) == ["s1"]


def test_live_slow_holder_is_never_stolen(tmp_path):
    """A holder slower than the staleness horizon keeps its lock: the
    heartbeat refreshes the lock mtime, so a waiter with the same short
    horizon blocks until the real release instead of stealing a live
    lock (the old breaker stole any lock once ITS deadline passed)."""
    state = str(tmp_path / "state")
    os.makedirs(state, exist_ok=True)
    in_critical = threading.Event()
    holder_done = threading.Event()
    overlap: list[str] = []

    def holder() -> None:
        with dedup._state_lock(state, stale_after=1.0):
            in_critical.set()
            time.sleep(3.0)  # 3x the horizon -- heartbeat must cover it
            holder_done.set()

    def waiter() -> None:
        in_critical.wait(timeout=10)
        with dedup._state_lock(state, stale_after=1.0):
            if not holder_done.is_set():
                overlap.append("waiter entered while holder alive")

    th, tw = threading.Thread(target=holder), threading.Thread(target=waiter)
    th.start()
    tw.start()
    th.join(timeout=30)
    tw.join(timeout=30)
    assert overlap == []


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _span_rows(ids, dup_every=3):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for i in ids:
        uniq = " ".join(f"w{i}x{j}" for j in range(12))
        text = f"{base} {uniq}" if i % dup_every == 0 else uniq
        rows.append((i, text))
    return rows


def test_concurrent_same_batch_cdc_ingest_commits_once(spark, tmp_path):
    """Two threads racing the SAME batch into one CDC state: the lock
    serializes the applied-check + append + commit, so exactly one
    generation lands (the loser takes the already-applied path) and the
    ledger keeps its one-row-per-distinct-hash invariant."""
    all_docs = _mk_docs(spark, _span_rows(range(20)))
    state = str(tmp_path / "state")
    dedup.init_cdc_state(all_docs.filter("doc_id < 10"), state)
    batch = all_docs.filter("doc_id >= 10")
    results: list[set] = []
    errs: list[BaseException] = []

    def ingest() -> None:
        try:
            results.append(
                {tuple(r) for r in dedup.ingest_cdc_batch(batch, state).collect()}
            )
        except BaseException as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=ingest) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs
    assert results[0] == results[1]
    exp = {
        tuple(r)
        for r in dedup.cdc_span_dedup(all_docs).filter("doc_id >= 10").collect()
    }
    assert results[0] == exp
    stamp = "cdc-" + dedup._batch_stamp(batch)
    led = spark.read.parquet(dedup._cdc_ledger_path(state))
    assert (
        led.filter(led.batch_stamp == stamp).select("batch_seq").distinct()
        .count() == 1
    )
    audit = dedup.audit_cdc_ledger(spark, state).collect()
    assert all(r["committed"] for r in audit)
    assert all(r["n_rows"] == r["n_distinct_hashes"] for r in audit)


def test_concurrent_distinct_batches_get_distinct_generations(spark, tmp_path):
    """Two DIFFERENT batches racing one CDC state: generation numbers are
    allocated under the lock, so the batches land at distinct seqs and
    the union of surviving hashes matches some serial arrival order."""
    all_docs = _mk_docs(spark, _span_rows(range(30)))
    state = str(tmp_path / "state")
    dedup.init_cdc_state(all_docs.filter("doc_id < 10"), state)
    b1 = all_docs.filter("doc_id >= 10 and doc_id < 20")
    b2 = all_docs.filter("doc_id >= 20")
    errs: list[BaseException] = []

    def ingest(b) -> None:
        try:
            dedup.ingest_cdc_batch(b, state).collect()
        except BaseException as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=ingest, args=(b,)) for b in (b1, b2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs
    audit = dedup.audit_cdc_ledger(spark, state).collect()
    seqs = sorted(r["batch_seq"] for r in audit)
    assert seqs == [0, 1, 2]
    assert all(r["committed"] for r in audit)
    # set semantics: every distinct hash of the full corpus is ledgered
    # exactly once regardless of which batch won the race
    led = spark.read.parquet(dedup._cdc_ledger_path(state))
    n_hashes = led.select("chunk_hash").distinct().count()
    assert led.count() == n_hashes
    exp_hashes = (
        dedup.cdc_chunks(all_docs).select("chunk_hash").distinct().count()
    )
    assert n_hashes == exp_hashes


def test_legacy_dir_reads_uncommitted_until_migrated(spark, tmp_path):
    """The silent keeper-log-presence fallback is retired: a pre-ledger
    dir (keeper log present, sidecar absent) reads as nothing-committed
    -- a TORN legacy append is no longer misclassified as committed --
    and migrate_stamp_ledger is the explicit opt-in that seeds the
    sidecar from the legacy rule."""
    docs = _mk_docs(spark, _span_rows(range(12)))
    state = str(tmp_path / "state")
    dedup.init_dedup_state(docs, state, quality_col="doc_id")
    ledger = dedup._stamp_ledger_path(state)
    with open(ledger) as fh:
        committed_before = set(json.load(fh))
    os.unlink(ledger)  # simulate a pre-ledger legacy dir
    with pytest.warns(FutureWarning, match="pre-ledger"):
        assert dedup._applied_stamps(spark, state) == set()
    restored = dedup.migrate_stamp_ledger(spark, state)
    assert restored == committed_before
    # idempotent: a second call changes nothing
    assert dedup.migrate_stamp_ledger(spark, state) == committed_before


def test_compaction_rebuckets_and_ingest_still_composes(spark, tmp_path,
                                                        monkeypatch):
    """A re-bucketing compaction (prefix length re-tuned to the grown
    corpus) swaps the layout to the new width; the next ingest reads the
    width from the layout itself and composes exactly."""
    all_docs = _mk_docs(spark, _span_rows(range(30)))
    state = str(tmp_path / "state")
    dedup.init_cdc_state(all_docs.filter("doc_id < 10"), state)
    assert dedup._cdc_pfx_len(state) == 1  # small state -> 16 buckets
    dedup.ingest_cdc_batch(
        all_docs.filter("doc_id >= 10 and doc_id < 20"), state)
    monkeypatch.setattr(dedup, "_pick_pfx_len", lambda n: 2)
    dedup.compact_cdc_state(spark, state)
    assert dedup._cdc_pfx_len(state) == 2  # layout re-bucketed
    got = {
        tuple(r)
        for r in dedup.ingest_cdc_batch(
            all_docs.filter("doc_id >= 20"), state).collect()
    }
    exp = {
        tuple(r)
        for r in dedup.cdc_span_dedup(all_docs).filter("doc_id >= 20").collect()
    }
    assert got == exp
    # superset invariant holds at the new width too
    led = spark.read.parquet(
        dedup._cdc_ledger_path(state)).select("chunk_hash").distinct()
    assert dedup._bloom_candidates(spark, state, led).count() == led.count()


def test_bloom_width_mismatch_degrades_to_full_probe(spark, tmp_path):
    """Crash window of a re-bucketing compaction: ledger swapped to the
    new width, bloom swap pending (old width).  The probe must treat the
    sidecar as unusable -- every hash becomes a candidate (correct,
    unpruned) instead of silently matching nothing and letting
    duplicates through."""
    import shutil

    all_docs = _mk_docs(spark, _span_rows(range(20)))
    state = str(tmp_path / "state")
    dedup.init_cdc_state(all_docs.filter("doc_id < 10"), state)
    # simulate: bloom rows rebuilt at width 2 while the ledger is width 1
    bdir = dedup._cdc_bloom_dir(state)
    led = spark.read.parquet(
        dedup._cdc_ledger_path(state)).select("chunk_hash").distinct()
    shutil.rmtree(bdir)
    dedup._bloom_rows(led, 2).write.mode("append").partitionBy(
        "pfx").parquet(bdir)
    assert dedup._layout_pfx_len(bdir) == 2 != dedup._cdc_pfx_len(state)
    batch_hashes = dedup.cdc_chunks(
        all_docs.filter("doc_id >= 10")).select("chunk_hash").distinct()
    cands = dedup._bloom_candidates(spark, state, batch_hashes)
    assert cands.count() == batch_hashes.count()  # all-candidates degrade
    # and the ingest built on it still composes exactly
    got = {
        tuple(r)
        for r in dedup.ingest_cdc_batch(
            all_docs.filter("doc_id >= 10"), state).collect()
    }
    exp = {
        tuple(r)
        for r in dedup.cdc_span_dedup(all_docs).filter("doc_id >= 10").collect()
    }
    assert got == exp


def test_unmigrated_legacy_write_paths_refuse(spark, tmp_path):
    """Write paths (ingest, compaction) refuse a pre-ledger dir outright:
    ingesting would double-apply legacy batches (their stamps read as
    uncommitted), and compaction would seed a marker-only ledger whose
    mid-swap crash makes every legacy generation invisible -- a retry
    would then rewrite the logs from an EMPTY view.  migrate_stamp_ledger
    restores both paths."""
    docs = _mk_docs(spark, _span_rows(range(12))).withColumn(
        "n_chars", __import__("pyspark.sql.functions", fromlist=["F"])
        .length("text"))
    state = str(tmp_path / "state")
    dedup.init_dedup_state(docs, state, quality_col="doc_id")
    os.unlink(dedup._stamp_ledger_path(state))  # simulate pre-ledger dir
    with pytest.raises(ValueError, match="migrate_stamp_ledger"):
        dedup.ingest_batch(docs.limit(2), state)
    with pytest.raises(ValueError, match="migrate_stamp_ledger"):
        dedup.compact_dedup_state(spark, state)
    dedup.migrate_stamp_ledger(spark, state)
    stats = dedup.compact_dedup_state(spark, state)  # now safe
    assert stats["keepers_rows_after"] == stats["keepers_rows_before"]
    # resolution preserved through migrate + compact
    _labels, keepers = dedup.load_cluster_state(spark, state)
    assert keepers.count() == stats["keepers_rows_after"]


def test_dispossessed_holder_leaves_usurpers_lock_alone(tmp_path):
    """A holder whose lock was stolen while it was frozen (ownership
    token no longer matches) must NOT unlink the new holder's live lock
    on release -- that would re-admit a third writer."""
    lock = str(tmp_path / "x.lock")
    with dedup._path_lock(lock, stale_after=60.0):
        # simulate the steal: the usurper's lock replaces ours
        with open(lock, "wb") as fh:
            fh.write(b"usurper-token")
    assert os.path.exists(lock)  # survived our release
    with open(lock, "rb") as fh:
        assert fh.read() == b"usurper-token"
    os.unlink(lock)
    # normal path still cleans up after itself
    with dedup._path_lock(lock, stale_after=60.0):
        pass
    assert not os.path.exists(lock)


def test_mismatched_banding_append_invalidates_sidecar_meta(spark, tmp_path):
    """Appending signatures under a DIFFERENT banding than the sidecar's
    meta must invalidate the meta: the new docs have no band rows at the
    meta's banding, so a later probe trusting it would silently lose
    their candidates.  After invalidation the probe derives bands and
    results match a sidecar-free table."""
    rows = [(i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(20)))
            for i in range(40)]
    docs = _mk_docs(spark, rows)
    sig_path = str(tmp_path / "sigs.parquet")
    dedup.minhash_lsh_candidates(
        docs.filter("doc_id % 3 = 0"), persist_signatures=sig_path).collect()
    assert dedup._bands_sidecar_usable(sig_path, 8, 8)
    # append at n_bands=4: sidecar can't cover it -> meta must go
    dedup.incremental_minhash_candidates(
        docs.filter("doc_id % 3 = 1"), sig_path, n_bands=4,
        append=True).collect()
    assert not dedup._bands_sidecar_usable(sig_path, 8, 8)
    got = {
        tuple(r) for r in dedup.incremental_minhash_candidates(
            docs.filter("doc_id % 3 = 2"), sig_path, append=False).collect()
    }
    import shutil
    shutil.rmtree(dedup._bands_sidecar_path(sig_path), ignore_errors=True)
    exp = {
        tuple(r) for r in dedup.incremental_minhash_candidates(
            docs.filter("doc_id % 3 = 2"), sig_path, append=False).collect()
    }
    assert got == exp


def test_steal_reobserves_and_never_displaces_a_fresh_lock(tmp_path):
    """_steal_stale displaces ONLY the inode it observed stale: if the
    lock was re-acquired between the observation and the steal attempt
    (fresh content under the same path), the attempt is a no-op -- the
    stat-to-replace TOCTOU that let one waiter displace another's LIVE
    lock (round-11 self-review, dedup.py:2326)."""
    lock = str(tmp_path / "x.lock")
    # (a) fresh holder took over after our stale observation: untouched
    with open(lock, "wb") as fh:
        fh.write(b"fresh-token")
    dedup._steal_stale(lock, b"stale-token", stale_after=60.0)
    with open(lock, "rb") as fh:
        assert fh.read() == b"fresh-token"
    # (b) same content but recently heartbeated: untouched (mtime check)
    dedup._steal_stale(lock, b"fresh-token", stale_after=60.0)
    assert os.path.exists(lock)
    # (c) genuinely stale and content-matching: reclaimed
    old = time.time() - 3600
    os.utime(lock, (old, old))
    dedup._steal_stale(lock, b"fresh-token", stale_after=60.0)
    assert not os.path.exists(lock)
    # no mutex or tombstone debris in any case
    assert not [p for p in os.listdir(tmp_path)
                if ".steal" in p or ".stealing" in p]


def test_steal_mutex_crash_debris_is_reclaimed(tmp_path):
    """A stealer that crashed while holding the micro steal-mutex must
    not deadlock every future waiter: debris older than the staleness
    horizon is reclaimed and the steal proceeds."""
    state = str(tmp_path / "state")
    lock = _plant_stale_lock(state)
    mutex = lock + ".stealing"
    with open(mutex, "w") as fh:
        fh.write("")
    old = time.time() - 3600
    os.utime(mutex, (old, old))
    t0 = time.time()
    dedup._record_applied(state, "s1")
    assert time.time() - t0 < 10.0
    with open(dedup._stamp_ledger_path(state)) as fh:
        assert json.load(fh) == ["s1"]
    assert not os.path.exists(mutex)


def test_dispossessed_holder_cannot_commit(tmp_path):
    """The round-11 verdict's last lock soft spot: a holder frozen past
    the staleness horizon whose lock was stolen must FAIL-STOP at the
    commit point on resume -- never run the ledger read-modify-write
    concurrently with the usurper and drop its stamps."""
    state = str(tmp_path / "state")
    os.makedirs(state, exist_ok=True)
    dedup._record_applied(state, "existing")
    with dedup._state_lock(state) as lk:
        assert lk.owned()
        lock_path = dedup._stamp_ledger_path(state) + ".lock"
        with open(lock_path, "wb") as fh:  # simulate the steal
            fh.write(b"usurper-token")
        assert not lk.owned()
        with pytest.raises(dedup.StateLockLost):
            dedup._record_applied(state, "victim-stamp",
                                  locked=True, lock=lk)
        with pytest.raises(dedup.StateLockLost):
            dedup._verify_owned(lk)
    # the victim's stamp never landed; the pre-existing one survived
    with open(dedup._stamp_ledger_path(state)) as fh:
        assert json.load(fh) == ["existing"]
    os.unlink(lock_path)


def test_custom_lock_provider_is_honored(spark, tmp_path):
    """The object-store deployment hook: a provider installed via
    set_state_lock_provider replaces the POSIX lock file for EVERY
    state-dir write path (init commit, batch ingest, compaction
    swap)."""
    from contextlib import contextmanager

    calls: list[str] = []

    @contextmanager
    def provider(state_dir, stale_after):
        calls.append(state_dir)
        yield  # no handle: the provider fences its own holders

    all_docs = _mk_docs(spark, _span_rows(range(20)))
    state = str(tmp_path / "state")
    dedup.set_state_lock_provider(provider)
    try:
        dedup.init_cdc_state(all_docs.filter("doc_id < 10"), state)
        assert calls and all(c == state for c in calls)
        n_init = len(calls)
        got = {
            tuple(r)
            for r in dedup.ingest_cdc_batch(
                all_docs.filter("doc_id >= 10"), state).collect()
        }
        assert len(calls) > n_init
        n_ingest = len(calls)
        dedup.compact_cdc_state(spark, state)
        assert len(calls) > n_ingest
    finally:
        dedup.set_state_lock_provider(None)
    # no POSIX lock file was ever created
    assert not os.path.exists(dedup._stamp_ledger_path(state) + ".lock")
    exp = {
        tuple(r)
        for r in dedup.cdc_span_dedup(all_docs).filter("doc_id >= 10").collect()
    }
    assert got == exp


# --- round-13: the conditional-put lease provider (object-store lock) ----
# Mirrors the file-lock hazard matrix (atomic steal, heartbeat liveness,
# dispossession fail-stop) against the reference object-store provider.

def _lease_key(state: str) -> str:
    return state.rstrip("/") + "/.state_lease"


def _plant_expired_lease(store, state: str, token: str = "dead",
                         deadline: float = 0.0) -> str:
    etag = store.put_if(
        _lease_key(state),
        json.dumps({"token": token, "deadline": deadline}).encode(), None)
    assert etag is not None
    return etag


def test_lease_provider_stale_steal_is_atomic_across_committers(tmp_path):
    """Provider analog of the file-lock atomic-steal test: a planted
    EXPIRED lease plus many racing committers -- every stamp survives
    (the CAS steal admits one stealer at a time into the ledger
    read-modify-write), and the last release deletes the lease."""
    from dask_patternsearch_spark import state_locks as sl

    store = sl.InMemoryConditionalStore()
    state = str(tmp_path / "state")
    os.makedirs(state, exist_ok=True)
    _plant_expired_lease(store, state, deadline=time.time() - 3600)
    dedup.set_state_lock_provider(sl.conditional_put_lock_provider(store))
    errs: list[BaseException] = []
    try:
        def commit(i: int) -> None:
            try:
                dedup._record_applied(state, f"stamp-{i}")
            except BaseException as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=commit, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
    finally:
        dedup.set_state_lock_provider(None)
    assert not errs
    with open(dedup._stamp_ledger_path(state)) as fh:
        assert set(json.load(fh)) == {f"stamp-{i}" for i in range(8)}
    assert store.get(_lease_key(state)) is None  # fenced release cleaned up
    # and no POSIX lock file was ever touched
    assert not os.path.exists(dedup._stamp_ledger_path(state) + ".lock")


def test_lease_provider_live_slow_holder_is_never_stolen(tmp_path):
    """Provider analog of the heartbeat-liveness test: a holder 3x
    slower than the lease horizon keeps renewing; a same-horizon waiter
    blocks until the real release instead of stealing."""
    from dask_patternsearch_spark import state_locks as sl

    store = sl.InMemoryConditionalStore()
    provider = sl.conditional_put_lock_provider(store, poll=0.02)
    state = str(tmp_path / "state")
    in_critical = threading.Event()
    holder_done = threading.Event()
    overlap: list[str] = []

    def holder() -> None:
        with provider(state, stale_after=1.0):
            in_critical.set()
            time.sleep(3.0)  # heartbeat must renew the lease throughout
            holder_done.set()

    def waiter() -> None:
        in_critical.wait(timeout=10)
        with provider(state, stale_after=1.0):
            if not holder_done.is_set():
                overlap.append("waiter entered while holder alive")

    th, tw = threading.Thread(target=holder), threading.Thread(target=waiter)
    th.start()
    tw.start()
    th.join(timeout=30)
    tw.join(timeout=30)
    assert overlap == []
    assert store.get(_lease_key(state)) is None


def test_lease_provider_dispossessed_holder_cannot_commit(tmp_path):
    """Provider analog of the dispossession fail-stop: a holder whose
    lease generation moved (stolen while suspended) must fail-stop at
    the commit point, and its fenced release must leave the usurper's
    lease alone."""
    from dask_patternsearch_spark import state_locks as sl

    store = sl.InMemoryConditionalStore()
    state = str(tmp_path / "state")
    os.makedirs(state, exist_ok=True)
    dedup._record_applied(state, "existing")  # pre-seed WITHOUT provider
    dedup.set_state_lock_provider(sl.conditional_put_lock_provider(store))
    try:
        with dedup._state_lock(state) as lk:
            assert lk.owned()
            # simulate the steal: replace the lease generation
            cur = store.get(_lease_key(state))
            store.put_if(
                _lease_key(state),
                json.dumps({"token": "usurper",
                            "deadline": time.time() + 60}).encode(),
                cur[1])
            assert not lk.owned()
            with pytest.raises(dedup.StateLockLost):
                dedup._record_applied(state, "victim-stamp",
                                      locked=True, lock=lk)
            with pytest.raises(dedup.StateLockLost):
                dedup._verify_owned(lk)
    finally:
        dedup.set_state_lock_provider(None)
    with open(dedup._stamp_ledger_path(state)) as fh:
        assert json.load(fh) == ["existing"]
    cur = store.get(_lease_key(state))  # usurper's lease survived release
    assert cur is not None and json.loads(cur[0])["token"] == "usurper"


def test_lease_provider_steal_is_fenced_on_generation(tmp_path):
    """The CAS fence under an injected race: a competing steal lands
    INSIDE the acquirer's observe->put window (via the store's interpose
    hook), so the acquirer's conditional put fails instead of displacing
    the competitor's fresh lease; the acquirer then re-contends and wins
    only after that lease expires."""
    from dask_patternsearch_spark import state_locks as sl

    t = [1000.0]
    fired: list[int] = []
    store = sl.InMemoryConditionalStore()

    def interpose(op, key):
        if op == "put_if" and not fired:
            fired.append(1)
            cur = store.get(key)
            if cur is not None:  # competing steal of the SAME generation
                assert store.put_if(
                    key,
                    json.dumps({"token": "rival",
                                "deadline": t[0] + 5.0}).encode(),
                    cur[1]) is not None

    provider = sl.conditional_put_lock_provider(
        store, clock=lambda: t[0], poll=0.01)
    state = str(tmp_path / "state")
    _plant_expired_lease(store, state, deadline=0.0)
    store.interpose = interpose  # armed AFTER the plant's own put_if
    acquired = threading.Event()
    inside: dict = {}

    def acquirer() -> None:
        with provider(state, stale_after=5.0) as lk:
            inside["owned"] = lk.owned()
            cur = store.get(_lease_key(state))
            inside["token_is_rivals"] = (
                json.loads(cur[0])["token"] == "rival")
            acquired.set()

    th = threading.Thread(target=acquirer)
    th.start()
    # the rival's fresh lease is live: the acquirer must NOT get in
    assert not acquired.wait(timeout=0.5)
    t[0] += 6.0  # rival's lease expires; the acquirer's CAS steal wins
    assert acquired.wait(timeout=10)
    th.join(timeout=10)
    assert inside == {"owned": True, "token_is_rivals": False}


def test_lease_provider_end_to_end_cdc_ingest(spark, tmp_path):
    """The real provider behind every CDC write path: init + ingest +
    compaction compose to the one-shot rewrite, no POSIX lock file is
    created, and the lease is released after each step."""
    from dask_patternsearch_spark import state_locks as sl

    store = sl.InMemoryConditionalStore()
    all_docs = _mk_docs(spark, _span_rows(range(20)))
    state = str(tmp_path / "state")
    dedup.set_state_lock_provider(sl.conditional_put_lock_provider(store))
    try:
        dedup.init_cdc_state(all_docs.filter("doc_id < 10"), state)
        got = {
            tuple(r)
            for r in dedup.ingest_cdc_batch(
                all_docs.filter("doc_id >= 10"), state).collect()
        }
        dedup.compact_cdc_state(spark, state)
    finally:
        dedup.set_state_lock_provider(None)
    exp = {
        tuple(r)
        for r in dedup.cdc_span_dedup(all_docs).filter("doc_id >= 10").collect()
    }
    assert got == exp
    assert not os.path.exists(dedup._stamp_ledger_path(state) + ".lock")
    assert store.get(_lease_key(state)) is None
