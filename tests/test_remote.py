"""Remote scatter/gather: wire protocol, coordinator integration, peer death."""

import queue
import threading
import time

import pytest

import bloomsearch_tpu as bs
from bloomsearch_tpu import BloomSearchEngine, BloomSearchEngineConfig, FileSystemDataStore
from bloomsearch_tpu.parallel import (
    QueryServer,
    RemoteQueryPeer,
    ScatterGatherCoordinator,
)
from bloomsearch_tpu.query import query_from_json, query_to_json

TIMEOUT = 15.0


def make_engine(tmp_path, name, rows):
    store = FileSystemDataStore(str(tmp_path / name))
    engine = BloomSearchEngine(
        BloomSearchEngineConfig(row_data_compression="none"), store, store
    )
    engine.start()
    engine.ingest_rows(rows, timeout=TIMEOUT)
    engine.flush(timeout=TIMEOUT)
    return engine


class TestQuerySerialization:
    def test_round_trip_full_query(self):
        q = (
            bs.new_query()
            .match(
                bs.or_(
                    bs.field_token("svc", "auth"),
                    bs.and_(bs.token("error"), bs.field("trace.id")),
                )
            )
            .field_regex("msg", r"time\d+out")
            .match_prefilter(
                bs.prefilter_and(
                    bs.partition(bs.partition_in("00", "01")),
                    bs.min_max("ts", bs.numeric_between(10, 99)),
                )
            )
            .build()
        )
        assert query_from_json(query_to_json(q)) == q

    def test_round_trip_empty_and_none(self):
        q = bs.new_query().build()
        assert query_from_json(query_to_json(q)) == q
        assert query_to_json(None) is None
        assert query_from_json(None) is None

    def test_json_is_actually_serializable(self):
        import json

        q = bs.new_query().token("x").match_prefilter(
            bs.partition(bs.partition_equals("07"))
        ).build()
        wire = json.dumps(query_to_json(q))
        assert query_from_json(json.loads(wire)) == q


class TestRemotePeer:
    def test_remote_query_matches_local(self, tmp_path):
        rows = [{"n": i, "svc": "auth", "msg": f"tok{i}"} for i in range(20)]
        engine = make_engine(tmp_path, "a", rows)
        try:
            with QueryServer(engine) as server:
                peer = RemoteQueryPeer(*server.address)
                q = bs.new_query().token("tok7").build()
                assert peer.query_sync(q, timeout=TIMEOUT) == engine.query_sync(
                    q, timeout=TIMEOUT
                )
                # Match-all (None query).
                got = peer.query_sync(None, timeout=TIMEOUT)
                assert sorted(r["n"] for r in got) == list(range(20))
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_stats_forwarded(self, tmp_path):
        from bloomsearch_tpu.engine import BlockStats

        engine = make_engine(tmp_path, "a", [{"msg": "hello"}])
        try:
            with QueryServer(engine) as server:
                peer = RemoteQueryPeer(*server.address)
                result_q: queue.Queue = queue.Queue()
                stats_q: queue.Queue = queue.Queue()
                peer.query(bs.new_query().token("hello").build(), result_q, None, stats_q)
                while result_q.get(timeout=TIMEOUT) is not None:
                    pass
                stats = []
                while not stats_q.empty():
                    stats.append(stats_q.get_nowait())
                assert stats and all(isinstance(s, BlockStats) for s in stats)
                assert any(s.rows_processed == 1 for s in stats)
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_connect_failure_reports_error_and_completes(self):
        peer = RemoteQueryPeer("127.0.0.1", 1, connect_timeout=0.5)  # nothing there
        result_q: queue.Queue = queue.Queue()
        error_q: queue.Queue = queue.Queue()
        peer.query(bs.new_query().token("x").build(), result_q, error_q)
        assert result_q.get(timeout=TIMEOUT) is None
        assert isinstance(error_q.get_nowait(), ConnectionError)

    def test_stale_assignment_error_typed_across_the_wire(self, tmp_path):
        """StaleFileAssignmentError must survive the protocol as its own
        type (an error_kind tag), not collapse into RuntimeError — the
        scatter coordinator reacts to it structurally (fresh-snapshot
        restart instead of peer failover)."""
        from bloomsearch_tpu.engine import StaleFileAssignmentError

        engine = make_engine(tmp_path, "a", [{"msg": "x"}])
        try:
            with QueryServer(engine) as server:
                peer = RemoteQueryPeer(*server.address)
                result_q: queue.Queue = queue.Queue()
                error_q: queue.Queue = queue.Queue()
                peer.query(
                    bs.new_query().token("x").build(), result_q, error_q,
                    file_pointers={b"\x00" * 8},  # listed nowhere
                )
                while result_q.get(timeout=TIMEOUT) is not None:
                    pass
                err = error_q.get_nowait()
                assert isinstance(err, StaleFileAssignmentError), err
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_invalid_regex_surfaces_as_error(self, tmp_path):
        engine = make_engine(tmp_path, "a", [{"msg": "x"}])
        try:
            with QueryServer(engine) as server:
                peer = RemoteQueryPeer(*server.address)
                q = bs.new_query().field_regex("msg", "[invalid").build()
                with pytest.raises(Exception):
                    peer.query_sync(q, timeout=TIMEOUT)
        finally:
            engine.stop(timeout=TIMEOUT)


class TestRemoteScatterGather:
    def test_coordinator_over_remote_peers(self, tmp_path):
        engine_a = make_engine(
            tmp_path, "a", [{"n": i, "site": "a", "tag": "common"} for i in range(5)]
        )
        engine_b = make_engine(
            tmp_path, "b", [{"n": i, "site": "b", "tag": "common"} for i in range(5, 9)]
        )
        try:
            with QueryServer(engine_a) as sa, QueryServer(engine_b) as sb:
                coord = ScatterGatherCoordinator(
                    [RemoteQueryPeer(*sa.address), RemoteQueryPeer(*sb.address)]
                )
                rows = coord.query_sync(
                    bs.new_query().token("common").build(), timeout=TIMEOUT
                )
                assert sorted(r["n"] for r in rows) == list(range(9))
        finally:
            engine_a.stop(timeout=TIMEOUT)
            engine_b.stop(timeout=TIMEOUT)

    def test_peer_killed_mid_stream_others_complete(self, tmp_path):
        """The reference's failure model: an erroring worker reports and
        stops; everyone else finishes (README.md:77-79)."""

        class SlowOpenStore(FileSystemDataStore):
            delay = 0.0

            def open_file(self, pointer):
                if self.delay:
                    time.sleep(self.delay)
                return super().open_file(pointer)

        slow_store = SlowOpenStore(str(tmp_path / "slow"))
        engine_slow = BloomSearchEngine(
            BloomSearchEngineConfig(row_data_compression="none"), slow_store, slow_store
        )
        engine_slow.start()
        for i in range(4):
            engine_slow.ingest_rows([{"n": i, "tag": "common"}], timeout=TIMEOUT)
            engine_slow.flush(timeout=TIMEOUT)
        engine_fast = make_engine(
            tmp_path, "fast", [{"n": 100 + i, "tag": "common"} for i in range(3)]
        )
        try:
            server_slow = QueryServer(engine_slow)
            server_slow.start()
            with QueryServer(engine_fast) as server_fast:
                slow_store.delay = 0.2
                coord = ScatterGatherCoordinator(
                    [
                        RemoteQueryPeer(*server_slow.address),
                        RemoteQueryPeer(*server_fast.address),
                    ]
                )
                result_q: queue.Queue = queue.Queue()
                error_q: queue.Queue = queue.Queue()
                coord.query(bs.new_query().token("common").build(), result_q, error_q)
                time.sleep(0.3)  # slow peer is mid-stream
                server_slow.stop()  # kill it

                rows = []
                while True:
                    item = result_q.get(timeout=TIMEOUT)
                    if item is None:
                        break
                    rows.append(item)
                # The healthy peer's rows all arrived...
                got_fast = sorted(r["n"] for r in rows if r["n"] >= 100)
                assert got_fast == [100, 101, 102]
                # ...and the dead peer's failure was reported.
                err = error_q.get(timeout=TIMEOUT)
                assert isinstance(err, (ConnectionError, RuntimeError)), err
        finally:
            engine_slow.stop(timeout=TIMEOUT)
            engine_fast.stop(timeout=TIMEOUT)


class TestConcurrentRemoteQueries:
    def test_many_queries_one_server(self, tmp_path):
        rows = [{"n": i, "msg": f"tok{i} all"} for i in range(50)]
        engine = make_engine(tmp_path, "a", rows)
        try:
            with QueryServer(engine) as server:
                peer = RemoteQueryPeer(*server.address)
                results = {}
                errors = []

                def one(i):
                    try:
                        results[i] = peer.query_sync(
                            bs.new_query().token(f"tok{i}").build(), timeout=TIMEOUT
                        )
                    except Exception as exc:
                        errors.append(exc)

                threads = [threading.Thread(target=one, args=(i,)) for i in range(12)]
                for t in threads:
                    t.start()
                for t in threads:
                    t.join(TIMEOUT)
                assert not errors
                for i in range(12):
                    assert results[i] == [rows[i]], i
        finally:
            engine.stop(timeout=TIMEOUT)


class TestStreamHardening:
    def test_malformed_frame_surfaces_error_not_truncation(self):
        """A version-skewed/garbage frame mid-stream must put an ERROR on
        error_queue — the reader's completion sentinel alone would read as
        a clean (silently truncated) result set."""
        import socket
        import threading

        from bloomsearch_tpu.parallel.remote import RemoteQueryPeer, send_frame

        listener = socket.socket()
        listener.bind(("127.0.0.1", 0))
        listener.listen(1)
        port = listener.getsockname()[1]

        def server():
            conn, _ = listener.accept()
            conn.recv(1 << 16)  # the query request
            send_frame(conn, {"row": {"a": 1}})
            # stats frame missing required fields -> KeyError client-side
            send_frame(conn, {"stats": [{"bogus": True}]})
            send_frame(conn, {"done": True})
            conn.close()

        threading.Thread(target=server, daemon=True).start()
        peer = RemoteQueryPeer("127.0.0.1", port)
        result_q: queue.Queue = queue.Queue()
        error_q: queue.Queue = queue.Queue()
        stats_q: queue.Queue = queue.Queue()
        peer.query(bs.new_query().token("x").build(), result_q, error_q, stats_q)
        rows = []
        while True:
            item = result_q.get(timeout=TIMEOUT)
            if item is None:
                break
            rows.append(item)
        err = error_q.get_nowait()
        assert "stream error" in repr(err)
        listener.close()

    def test_cancel_unblocks_parked_reader(self, tmp_path):
        """cancel_event must take effect while the reader is blocked in
        recv on a quiet stream (the watcher closes the socket)."""
        import socket
        import threading
        import time as _time

        listener = socket.socket()
        listener.bind(("127.0.0.1", 0))
        listener.listen(1)
        port = listener.getsockname()[1]
        held = []

        def server():
            conn, _ = listener.accept()
            conn.recv(1 << 16)
            held.append(conn)  # never send anything: reader parks in recv

        threading.Thread(target=server, daemon=True).start()
        from bloomsearch_tpu.parallel.remote import RemoteQueryPeer

        peer = RemoteQueryPeer("127.0.0.1", port)
        result_q: queue.Queue = queue.Queue()
        error_q: queue.Queue = queue.Queue()
        cancel = threading.Event()
        peer.query(
            bs.new_query().token("x").build(), result_q, error_q,
            cancel_event=cancel,
        )
        _time.sleep(0.3)  # reader is now parked in recv
        cancel.set()
        assert result_q.get(timeout=5.0) is None  # sentinel arrives promptly
        assert error_q.empty()  # canceled close is not an error
        listener.close()
