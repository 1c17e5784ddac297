"""The serve CLI: process-level QueryServer + registry announcement."""

import os
import signal
import subprocess
import sys
import time

import bloomsearch_tpu as bs
from bloomsearch_tpu.parallel import CapacityScatterCoordinator, PeerRegistry, RemoteQueryPeer

TIMEOUT = 30.0
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn(args):
    return subprocess.Popen(
        [sys.executable, "-m", "bloomsearch_tpu.serve", *args],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO},
    )


def _wait_for_port(proc, deadline=TIMEOUT):
    t0 = time.monotonic()
    for line in proc.stdout:
        if line.startswith("serving queries on "):
            host, port = line.strip().rsplit(" ", 1)[1].rsplit(":", 1)
            return host, int(port)
        if time.monotonic() - t0 > deadline:
            break
    raise AssertionError("server never announced its port")


def test_serve_filesystem_dataset(tmp_path):
    data_dir = str(tmp_path / "data")
    store = bs.FileSystemDataStore(data_dir)
    engine = bs.BloomSearchEngine(
        bs.BloomSearchEngineConfig(row_data_compression="none"), store, store
    )
    engine.start()
    engine.ingest_rows([{"n": i, "tag": "served"} for i in range(5)], timeout=TIMEOUT)
    engine.stop(timeout=TIMEOUT)

    proc = _spawn(["--dir", data_dir, "--host", "127.0.0.1", "--probe-backend", "host"])
    try:
        host, port = _wait_for_port(proc)
        peer = RemoteQueryPeer(host, port)
        rows = peer.query_sync(bs.new_query().token("served").build(), timeout=TIMEOUT)
        assert sorted(r["n"] for r in rows) == list(range(5))
    finally:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=TIMEOUT)


def test_serve_object_store_with_registry(tmp_path):
    bucket = str(tmp_path / "bucket")
    client = bs.LocalDirObjectStore(bucket)
    writer = bs.BloomSearchEngine(
        bs.BloomSearchEngineConfig(row_data_compression="none"),
        bs.ObjectStoreMetaStore(client),
        bs.ObjectStoreDataStore(client),
    )
    writer.start()
    for i in range(4):
        writer.ingest_rows([{"n": i, "tag": "shared"}], timeout=TIMEOUT)
        writer.flush(timeout=TIMEOUT)
    writer.stop(timeout=TIMEOUT)

    procs = [
        _spawn([
            "--object-dir", bucket, "--host", "127.0.0.1",
            "--probe-backend", "host", "--registry", "--peer-id", pid,
        ])
        for pid in ("pa", "pb")
    ]
    try:
        for p in procs:
            _wait_for_port(p)
        registry = PeerRegistry(client)
        deadline = time.monotonic() + TIMEOUT
        while len(registry.live_peers()) < 2:
            assert time.monotonic() < deadline, "peers never registered"
            time.sleep(0.1)
        coord = CapacityScatterCoordinator(bs.ObjectStoreMetaStore(client), registry)
        rows = coord.query_sync(bs.new_query().token("shared").build(), timeout=TIMEOUT)
        assert sorted(r["n"] for r in rows) == [0, 1, 2, 3]
    finally:
        for p in procs:
            p.send_signal(signal.SIGTERM)
        for p in procs:
            p.wait(timeout=TIMEOUT)
