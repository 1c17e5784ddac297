"""Peer registry + capacity-aware shared-storage scatter/gather."""

import queue
import time

import pytest

import bloomsearch_tpu as bs
from bloomsearch_tpu.objectstore import (
    InMemoryObjectStore,
    ObjectStoreDataStore,
    ObjectStoreMetaStore,
)
from bloomsearch_tpu.parallel import (
    CapacityScatterCoordinator,
    PeerInfo,
    PeerRegistry,
    QueryServer,
    RemoteQueryPeer,
    assign_files_by_capacity,
)

TIMEOUT = 15.0


class TestPeerRegistry:
    def test_announce_live_withdraw(self):
        client = InMemoryObjectStore()
        reg = PeerRegistry(client, ttl_seconds=30)
        reg.announce("p1", "127.0.0.1", 1234, capacity=2.0)
        reg.announce("p2", "127.0.0.1", 1235)
        peers = {p.peer_id: p for p in reg.live_peers()}
        assert set(peers) == {"p1", "p2"}
        assert peers["p1"].capacity == 2.0 and peers["p1"].port == 1234
        reg.withdraw("p1")
        assert {p.peer_id for p in reg.live_peers()} == {"p2"}

    def test_stale_peers_age_out(self):
        client = InMemoryObjectStore()
        reg = PeerRegistry(client, ttl_seconds=0.05)
        reg.announce("p1", "h", 1)
        time.sleep(0.1)
        assert reg.live_peers() == []

    def test_heartbeat_keeps_peer_alive_and_withdraws_on_stop(self):
        client = InMemoryObjectStore()
        reg = PeerRegistry(client, ttl_seconds=0.3)
        hb = reg.heartbeat("p1", "h", 1, interval=0.05)
        try:
            time.sleep(0.5)  # > ttl: only heartbeats keep it live
            assert {p.peer_id for p in reg.live_peers()} == {"p1"}
        finally:
            hb.stop()
        assert reg.live_peers() == []

    def test_malformed_record_skipped(self):
        client = InMemoryObjectStore()
        client.put("peers/bad", b"not json {")
        reg = PeerRegistry(client)
        reg.announce("good", "h", 2)
        assert {p.peer_id for p in reg.live_peers()} == {"good"}


class TestCapacityAssignment:
    class _MF:
        def __init__(self, pointer, size):
            self.pointer = pointer
            self.size = size

    def _peers(self, *capacities):
        return [
            PeerInfo(f"p{i}", "h", i, c, time.time()) for i, c in enumerate(capacities)
        ]

    def test_every_file_assigned_exactly_once(self):
        files = [self._MF(f"f{i}".encode(), 100 + i) for i in range(20)]
        assignment = assign_files_by_capacity(files, self._peers(1, 1, 1))
        all_assigned = [p for s in assignment.values() for p in s]
        assert sorted(all_assigned) == sorted(mf.pointer for mf in files)
        assert len(all_assigned) == len(set(all_assigned))

    def test_capacity_proportional_bytes(self):
        files = [self._MF(f"f{i}".encode(), 1000) for i in range(30)]
        assignment = assign_files_by_capacity(files, self._peers(2, 1))
        n0, n1 = len(assignment[0]), len(assignment[1])
        assert n0 + n1 == 30
        assert n0 == 20 and n1 == 10  # 2:1 capacity -> 2:1 bytes

    def test_no_peers_raises(self):
        with pytest.raises(ValueError):
            assign_files_by_capacity([self._MF(b"f", 1)], [])


class TestFilePointerRestriction:
    def test_engine_query_restricted_to_subset(self, tmp_path):
        store = bs.FileSystemDataStore(str(tmp_path / "data"))
        engine = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"), store, store
        )
        engine.start()
        try:
            for i in range(3):
                engine.ingest_rows([{"n": i, "tag": "common"}], timeout=TIMEOUT)
                engine.flush(timeout=TIMEOUT)
            files = store.get_maybe_files_for_query(None)
            subset = {files[0].pointer, files[2].pointer}
            result_q: queue.Queue = queue.Queue()
            engine.query(
                bs.new_query().token("common").build(), result_q,
                file_pointers=subset,
            )
            rows = []
            while True:
                item = result_q.get(timeout=TIMEOUT)
                if item is None:
                    break
                rows.append(item)
            assert len(rows) == 2

            # A pointer the engine's own listing no longer knows (merged or
            # expired since the coordinator's snapshot) must ERROR, not
            # silently return the surviving subset — the missing file's rows
            # live in a replacement file that is in nobody's assignment.
            result_q = queue.Queue()
            error_q: queue.Queue = queue.Queue()
            engine.query(
                bs.new_query().token("common").build(), result_q,
                error_q,
                file_pointers={files[1].pointer, b"\x00" * len(files[1].pointer)},
            )
            while result_q.get(timeout=TIMEOUT) is not None:
                pass
            err = error_q.get_nowait()
            assert isinstance(err, bs.StaleFileAssignmentError)
        finally:
            engine.stop(timeout=TIMEOUT)


class TestSharedStorageScatterGather:
    def test_two_compute_peers_one_dataset(self):
        """One object-store dataset; two engine peers discovered via the
        registry; the coordinator splits files between them — exact results,
        no duplicates (each file scanned exactly once)."""
        client = InMemoryObjectStore()
        data = ObjectStoreDataStore(client)
        meta = ObjectStoreMetaStore(client)

        writer = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"), meta, data
        )
        writer.start()
        for i in range(6):
            writer.ingest_rows([{"n": i, "tag": "common"}], timeout=TIMEOUT)
            writer.flush(timeout=TIMEOUT)
        writer.stop(timeout=TIMEOUT)

        reg = PeerRegistry(client, ttl_seconds=60)
        peers = []
        try:
            for pid, capacity in (("a", 1.0), ("b", 1.0)):
                e = bs.BloomSearchEngine(
                    bs.BloomSearchEngineConfig(row_data_compression="none"),
                    ObjectStoreMetaStore(client),
                    ObjectStoreDataStore(client),
                )
                e.start()
                server = QueryServer(e)
                server.start()
                reg.announce(pid, *server.address, capacity=capacity)
                peers.append((e, server))

            coord = CapacityScatterCoordinator(meta, reg)
            rows = coord.query_sync(bs.new_query().token("common").build(), timeout=TIMEOUT)
            assert sorted(r["n"] for r in rows) == list(range(6))  # exact, no dups

            # Needle query across the split.
            rows = coord.query_sync(bs.new_query().token("common").field_token("n", "3").build(), timeout=TIMEOUT)
            assert [r["n"] for r in rows] == [3]
        finally:
            for e, server in peers:
                server.stop()
                e.stop(timeout=TIMEOUT)

    def test_dead_peer_files_reassigned_to_survivor(self):
        """A peer that is registered but unreachable (connection refused):
        its disjoint file subset must re-run on the survivor and the full
        result set must come back — no loss, no duplicates."""
        client = InMemoryObjectStore()
        data = ObjectStoreDataStore(client)
        meta = ObjectStoreMetaStore(client)
        writer = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"), meta, data
        )
        writer.start()
        for i in range(6):
            writer.ingest_rows([{"n": i, "tag": "common"}], timeout=TIMEOUT)
            writer.flush(timeout=TIMEOUT)
        writer.stop(timeout=TIMEOUT)

        reg = PeerRegistry(client, ttl_seconds=60)
        live = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"),
            ObjectStoreMetaStore(client), ObjectStoreDataStore(client),
        )
        live.start()
        server = QueryServer(live)
        server.start()
        try:
            reg.announce("alive", *server.address, capacity=1.0)
            # Reserve a port, then close it: connecting gets refused.
            import socket as _socket

            s = _socket.socket()
            s.bind(("127.0.0.1", 0))
            dead_port = s.getsockname()[1]
            s.close()
            reg.announce("dead", "127.0.0.1", dead_port, capacity=1.0)

            coord = CapacityScatterCoordinator(meta, reg)
            rows = coord.query_sync(
                bs.new_query().token("common").build(), timeout=TIMEOUT
            )
            assert sorted(r["n"] for r in rows) == list(range(6))
        finally:
            server.stop()
            live.stop(timeout=TIMEOUT)

    def test_stale_snapshot_restarts_query_from_fresh_listing(self):
        """A merge publishes between the coordinator's metadata snapshot and
        the peers' own listings: every assigned pre-merge pointer is missing
        from every peer's view (StaleFileAssignmentError), so per-subset
        failover would deterministically re-raise on each survivor. The
        coordinator must instead restart the WHOLE query against a fresh
        snapshot — transparently: exact rows, no duplicates, no error."""
        client = InMemoryObjectStore()
        data = ObjectStoreDataStore(client)
        meta = ObjectStoreMetaStore(client)
        writer = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"), meta, data
        )
        writer.start()
        for i in range(6):
            writer.ingest_rows([{"n": i, "tag": "common"}], timeout=TIMEOUT)
            writer.flush(timeout=TIMEOUT)
        stale_listing = meta.get_maybe_files_for_query(None)
        stats = writer.merge()  # pre-merge pointers vanish from metadata
        writer.stop(timeout=TIMEOUT)
        assert stats.files_processed > 0
        fresh = {mf.pointer for mf in meta.get_maybe_files_for_query(None)}
        assert any(mf.pointer not in fresh for mf in stale_listing)

        class StaleOnceMeta:
            """First listing replays the pre-merge snapshot (the race);
            later listings delegate to the live store."""

            def __init__(self, real, stale):
                self.real, self.stale = real, stale
                self.calls = 0

            def get_maybe_files_for_query(self, prefilter):
                self.calls += 1
                if self.calls == 1:
                    return self.stale
                return self.real.get_maybe_files_for_query(prefilter)

        live = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"),
            ObjectStoreMetaStore(client), ObjectStoreDataStore(client),
        )
        live.start()
        server = QueryServer(live)
        server.start()
        try:
            reg = PeerRegistry(client, ttl_seconds=60)
            reg.announce("alive", *server.address, capacity=1.0)
            stale_meta = StaleOnceMeta(meta, stale_listing)
            coord = CapacityScatterCoordinator(stale_meta, reg)
            rows = coord.query_sync(
                bs.new_query().token("common").build(), timeout=TIMEOUT
            )
            assert sorted(r["n"] for r in rows) == list(range(6))
            assert stale_meta.calls >= 2  # a fresh snapshot was taken
        finally:
            server.stop()
            live.stop(timeout=TIMEOUT)

    def test_stale_attempt_discarded_wholesale_before_retry(self):
        """Rows buffered during a stale attempt must never reach the caller:
        the retry's complete result set replaces them (exactly-once)."""
        from bloomsearch_tpu.engine import StaleFileAssignmentError

        coord = CapacityScatterCoordinator(
            None, None, failover_buffer_rows=100, stale_snapshot_retries=2
        )
        attempts = []

        def fake_attempt(q, rq, eq, sq=None):
            attempts.append(1)
            if len(attempts) == 1:
                rq.put({"n": 99})  # partial rows of the doomed attempt
                eq.put(StaleFileAssignmentError("stale"))
            else:
                for i in range(3):
                    rq.put({"n": i})
            rq.put(None)

        coord._query_attempt = fake_attempt
        rq: queue.Queue = queue.Queue()
        eq: queue.Queue = queue.Queue()
        coord.query(bs.new_query().build(), rq, eq)
        rows = []
        while True:
            item = rq.get(timeout=TIMEOUT)
            if item is None:
                break
            rows.append(item)
        assert sorted(r["n"] for r in rows) == [0, 1, 2]
        assert eq.empty(), "transparent retry must not surface the error"
        assert len(attempts) == 2

    def test_stale_past_holdback_cap_surfaces_error_not_retry(self):
        """Once the global holdback overflows into stream-through, rows have
        reached the caller — a stale restart would duplicate them, so the
        error surfaces instead (same contract as peer-failover's cap)."""
        from bloomsearch_tpu.engine import StaleFileAssignmentError

        coord = CapacityScatterCoordinator(
            None, None, failover_buffer_rows=2, stale_snapshot_retries=3
        )
        attempts = []

        def fake_attempt(q, rq, eq, sq=None):
            attempts.append(1)
            for i in range(5):  # > cap: flips to stream-through
                rq.put({"n": i})
            eq.put(StaleFileAssignmentError("stale"))
            rq.put(None)

        coord._query_attempt = fake_attempt
        rq: queue.Queue = queue.Queue()
        eq: queue.Queue = queue.Queue()
        coord.query(bs.new_query().build(), rq, eq)
        rows = []
        while True:
            item = rq.get(timeout=TIMEOUT)
            if item is None:
                break
            rows.append(item)
        assert sorted(r["n"] for r in rows) == [0, 1, 2, 3, 4]
        err = eq.get_nowait()
        assert isinstance(err, StaleFileAssignmentError)
        assert len(attempts) == 1, "no retry after rows streamed through"

    def test_mid_stream_death_retries_exactly_once(self):
        """A peer that streams SOME rows then dies mid-stream: the partial
        buffer is discarded and its subset re-runs on the survivor — the
        gathered rows are exact (no duplicates of the partial stream)."""
        import socket as _socket
        import threading as _threading

        from bloomsearch_tpu.parallel.remote import recv_frame, send_frame

        client = InMemoryObjectStore()
        data = ObjectStoreDataStore(client)
        meta = ObjectStoreMetaStore(client)
        writer = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"), meta, data
        )
        writer.start()
        for i in range(6):
            writer.ingest_rows([{"n": i, "tag": "common"}], timeout=TIMEOUT)
            writer.flush(timeout=TIMEOUT)
        writer.stop(timeout=TIMEOUT)

        # Flaky peer: accepts, reads the request, emits ONE (duplicate-bait)
        # row, then slams the connection shut.
        lsock = _socket.socket()
        lsock.bind(("127.0.0.1", 0))
        lsock.listen(4)

        def flaky():
            while True:
                try:
                    conn, _ = lsock.accept()
                except OSError:
                    return
                try:
                    recv_frame(conn)
                    send_frame(conn, {"row": {"n": 0, "tag": "common"}})
                finally:
                    conn.close()

        t = _threading.Thread(target=flaky, daemon=True)
        t.start()

        reg = PeerRegistry(client, ttl_seconds=60)
        live = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"),
            ObjectStoreMetaStore(client), ObjectStoreDataStore(client),
        )
        live.start()
        server = QueryServer(live)
        server.start()
        try:
            reg.announce("alive", *server.address, capacity=1.0)
            reg.announce("flaky", "127.0.0.1", lsock.getsockname()[1], capacity=1.0)
            coord = CapacityScatterCoordinator(meta, reg)
            rows = coord.query_sync(
                bs.new_query().token("common").build(), timeout=TIMEOUT
            )
            # Exactly one of each row: the flaky peer's partial "n": 0 row
            # was discarded with its buffer, and the retry rescanned its
            # subset from storage.
            assert sorted(r["n"] for r in rows) == list(range(6))
        finally:
            lsock.close()
            server.stop()
            live.stop(timeout=TIMEOUT)

    def test_terminal_failure_delivers_buffered_rows_with_error(self):
        """A peer that streams healthy rows AND reports a per-block error,
        with no survivor to fail over to: the caller must receive the
        healthy rows ALONGSIDE the error (the local engine's per-block
        semantics) — not an empty result for the whole subset."""
        import socket as _socket
        import threading as _threading

        from bloomsearch_tpu.parallel.remote import recv_frame, send_frame

        client = InMemoryObjectStore()
        data = ObjectStoreDataStore(client)
        meta = ObjectStoreMetaStore(client)
        writer = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"), meta, data
        )
        writer.start()
        writer.ingest_rows([{"n": 0, "tag": "common"}], timeout=TIMEOUT)
        writer.flush(timeout=TIMEOUT)
        writer.stop(timeout=TIMEOUT)

        # Peer: streams 3 healthy rows, a per-block error, then done.
        lsock = _socket.socket()
        lsock.bind(("127.0.0.1", 0))
        lsock.listen(4)

        def half_broken():
            while True:
                try:
                    conn, _ = lsock.accept()
                except OSError:
                    return
                try:
                    recv_frame(conn)
                    for i in range(3):
                        send_frame(conn, {"row": {"n": i, "tag": "common"}})
                    send_frame(conn, {"error": "block 7: CRC mismatch"})
                    send_frame(conn, {"done": True})
                finally:
                    conn.close()

        t = _threading.Thread(target=half_broken, daemon=True)
        t.start()

        reg = PeerRegistry(client, ttl_seconds=60)
        try:
            reg.announce("half-broken", "127.0.0.1", lsock.getsockname()[1],
                         capacity=1.0)
            coord = CapacityScatterCoordinator(meta, reg, max_retries=1)
            import queue as _queue

            rq: _queue.Queue = _queue.Queue()
            eq: _queue.Queue = _queue.Queue()
            coord.query(bs.new_query().token("common").build(), rq, eq)
            rows = []
            while True:
                item = rq.get(timeout=TIMEOUT)
                if item is None:
                    break
                rows.append(item)
            errors = []
            while not eq.empty():
                errors.append(eq.get_nowait())
            # Every retry attempt lands on the same (only) peer; the final
            # attempt's healthy rows must be delivered, with the error.
            assert sorted(r["n"] for r in rows) == [0, 1, 2], rows
            assert errors, "per-block error must surface"
        finally:
            lsock.close()

    def test_buffer_cap_switches_to_stream_through(self):
        """Past failover_buffer_rows the funnel flushes and streams rows
        straight through (bounded coordinator memory); results stay exact
        for a healthy peer."""
        client = InMemoryObjectStore()
        data = ObjectStoreDataStore(client)
        meta = ObjectStoreMetaStore(client)
        writer = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"), meta, data
        )
        writer.start()
        writer.ingest_rows([{"n": i, "tag": "common"} for i in range(50)],
                           timeout=TIMEOUT)
        writer.flush(timeout=TIMEOUT)
        writer.stop(timeout=TIMEOUT)

        reg = PeerRegistry(client, ttl_seconds=60)
        live = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"),
            ObjectStoreMetaStore(client), ObjectStoreDataStore(client),
        )
        live.start()
        server = QueryServer(live)
        server.start()
        try:
            reg.announce("alive", *server.address, capacity=1.0)
            coord = CapacityScatterCoordinator(
                meta, reg, failover_buffer_rows=3
            )
            rows = coord.query_sync(
                bs.new_query().token("common").build(), timeout=TIMEOUT
            )
            assert sorted(r["n"] for r in rows) == list(range(50))
        finally:
            server.stop()
            live.stop(timeout=TIMEOUT)

    def test_death_after_stream_through_surfaces_error_not_duplicates(self):
        """A peer that dies AFTER the buffer cap flushed its rows cannot be
        replayed exactly-once; the funnel must surface the error instead of
        re-running the subset (which would duplicate delivered rows)."""
        import socket as _socket
        import threading as _threading

        from bloomsearch_tpu.parallel.remote import recv_frame, send_frame

        client = InMemoryObjectStore()
        data = ObjectStoreDataStore(client)
        meta = ObjectStoreMetaStore(client)
        writer = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"), meta, data
        )
        writer.start()
        writer.ingest_rows([{"n": i, "tag": "common"} for i in range(8)],
                           timeout=TIMEOUT)
        writer.flush(timeout=TIMEOUT)
        writer.stop(timeout=TIMEOUT)

        lsock = _socket.socket()
        lsock.bind(("127.0.0.1", 0))
        lsock.listen(4)

        def flaky():
            while True:
                try:
                    conn, _ = lsock.accept()
                except OSError:
                    return
                try:
                    recv_frame(conn)
                    for i in range(6):  # past the cap of 3, then die
                        send_frame(conn, {"row": {"n": 100 + i, "tag": "common"}})
                finally:
                    conn.close()

        _threading.Thread(target=flaky, daemon=True).start()
        reg = PeerRegistry(client, ttl_seconds=60)
        try:
            reg.announce("flaky", "127.0.0.1", lsock.getsockname()[1], capacity=1.0)
            coord = CapacityScatterCoordinator(
                meta, reg, failover_buffer_rows=3
            )
            results: queue.Queue = queue.Queue()
            errors: queue.Queue = queue.Queue()
            coord.query(bs.new_query().token("common").build(), results, errors)
            rows = []
            while True:
                item = results.get(timeout=TIMEOUT)
                if item is None:
                    break
                rows.append(item)
            assert not errors.empty(), "death after flush must surface an error"
            ns = [r["n"] for r in rows]
            assert len(ns) == len(set(ns)), "duplicated rows after failover"
        finally:
            lsock.close()

    def test_all_peers_dead_surfaces_error(self):
        client = InMemoryObjectStore()
        data = ObjectStoreDataStore(client)
        meta = ObjectStoreMetaStore(client)
        writer = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"), meta, data
        )
        writer.start()
        writer.ingest_rows([{"x": 1, "tag": "t"}], timeout=TIMEOUT)
        writer.stop(timeout=TIMEOUT)

        import socket as _socket

        s = _socket.socket()
        s.bind(("127.0.0.1", 0))
        dead_port = s.getsockname()[1]
        s.close()
        reg = PeerRegistry(client, ttl_seconds=60)
        reg.announce("dead", "127.0.0.1", dead_port)
        coord = CapacityScatterCoordinator(meta, reg)
        with pytest.raises(ConnectionError):
            coord.query_sync(bs.new_query().token("t").build(), timeout=TIMEOUT)

    def test_no_live_peers_reports_error(self):
        client = InMemoryObjectStore()
        data = ObjectStoreDataStore(client)
        meta = ObjectStoreMetaStore(client)
        writer = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"), meta, data
        )
        writer.start()
        writer.ingest_rows([{"x": 1}], timeout=TIMEOUT)
        writer.stop(timeout=TIMEOUT)

        coord = CapacityScatterCoordinator(meta, PeerRegistry(client))
        with pytest.raises(RuntimeError):
            coord.query_sync(None, timeout=TIMEOUT)
