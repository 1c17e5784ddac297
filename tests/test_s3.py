"""S3ObjectStore over an in-process SigV4-verifying fake S3 server.

The full object-store engine matrix (data store, CAS manifest MetaStore,
merge lease) runs over real HTTP here — matching the intent of the
reference's storage abstraction (README.md:289-315 names S3 buckets as the
point of it).
"""

import queue

import pytest

import bloomsearch_tpu as bs
from bloomsearch_tpu.objectstore import (
    ObjectStoreDataStore,
    ObjectStoreMetaStore,
    PreconditionFailed,
)
from bloomsearch_tpu.s3 import S3Error, S3ObjectStore

from s3fake import start_fake_s3

TIMEOUT = 20.0


@pytest.fixture()
def fake():
    state, server, endpoint = start_fake_s3()
    try:
        yield state, endpoint
    finally:
        server.shutdown()
        server.server_close()


def make_client(state, endpoint, **kw) -> S3ObjectStore:
    return S3ObjectStore(
        state.bucket,
        endpoint=endpoint,
        scheme="http",
        access_key=state.access_key,
        secret_key=state.secret_key,
        region="us-east-1",
        **kw,
    )


class TestClientSemantics:
    def test_conditional_put_delete(self, fake):
        state, endpoint = fake
        c = make_client(state, endpoint)
        etag1 = c.put("k", b"v1")
        with pytest.raises(PreconditionFailed):
            c.put("k", b"x", if_none_match=True)
        with pytest.raises(PreconditionFailed):
            c.put("k", b"x", if_match="wrong")
        etag2 = c.put("k", b"v2", if_match=etag1)
        assert etag2 != etag1
        assert c.get("k") == (b"v2", etag2)
        with pytest.raises(PreconditionFailed):
            c.delete("k", if_match=etag1)
        c.delete("k", if_match=etag2)
        with pytest.raises(KeyError):
            c.get("k")
        c.delete("k")  # idempotent unconditional

    def test_head_and_ranged_reads(self, fake):
        state, endpoint = fake
        c = make_client(state, endpoint)
        c.put("r", bytes(range(100)))
        size, etag = c.head("r")
        assert size == 100 and etag
        assert c.get_range("r", 10, 5) == bytes(range(10, 15))
        assert c.get_range("r", 95, 50) == bytes(range(95, 100))  # clamped
        assert c.get_range("r", 200, 10) == b""  # past EOF
        with pytest.raises(KeyError):
            c.head("absent")

    def test_range_ignoring_server_still_sliced(self, fake):
        # A server/proxy may legally answer a ranged GET with 200 + the
        # whole object; returning that verbatim would misattribute bytes
        # from offset 0 to the requested offset (corrupt bank/metadata
        # reads). The client must slice locally on 200.
        state, endpoint = fake
        c = make_client(state, endpoint)
        c.put("r", bytes(range(100)))
        state.ignore_range = True
        try:
            assert c.get_range("r", 10, 5) == bytes(range(10, 15))
            assert c.get_range("r", 95, 50) == bytes(range(95, 100))
            assert c.get_range("r", 200, 10) == b""  # past EOF
        finally:
            state.ignore_range = False

    def test_list_pagination(self, fake):
        state, endpoint = fake
        c = make_client(state, endpoint, list_page_size=3)
        for i in range(7):
            c.put(f"p/obj{i:02d}", b"x")
        c.put("other/x", b"y")
        # 7 keys at page size 3: the client follows continuation tokens.
        keys = c.list("p/")
        assert keys == [f"p/obj{i:02d}" for i in range(7)]

    def test_key_prefix_scoping(self, fake):
        state, endpoint = fake
        c = make_client(state, endpoint, key_prefix="tenant1/")
        c.put("a", b"1")
        assert c.list("") == ["a"]
        assert "tenant1/a" in state.objects
        assert c.get("a")[0] == b"1"

    def test_retry_on_503(self, fake):
        state, endpoint = fake
        c = make_client(state, endpoint)
        c.put("k", b"v")
        state.fail_next = 2
        data, _ = c.get("k")  # retries through two 503s
        assert data == b"v"

    def test_retries_exhausted(self, fake):
        state, endpoint = fake
        c = make_client(state, endpoint, max_retries=1)
        state.fail_next = 10
        with pytest.raises(S3Error) as exc_info:
            c.get("k")
        assert exc_info.value.status == 503
        state.fail_next = 0

    def test_bad_signature_rejected(self, fake):
        state, endpoint = fake
        bad = S3ObjectStore(
            state.bucket, endpoint=endpoint, scheme="http",
            access_key=state.access_key, secret_key="wrong-secret",
            max_retries=0,
        )
        with pytest.raises(S3Error) as exc_info:
            bad.put("k", b"v")
        assert exc_info.value.status == 403

    def test_signed_headers_cover_conditions(self, fake):
        # Range / If-Match headers participate in the signature: the fake
        # recomputes from the ACTUAL request headers, so a pass proves the
        # client signed what it sent.
        state, endpoint = fake
        c = make_client(state, endpoint)
        etag = c.put("k", bytes(range(50)))
        assert c.get_range("k", 5, 5) == bytes(range(5, 10))
        c.put("k", b"new", if_match=etag)

    def test_missing_credentials_raise(self, fake, monkeypatch):
        state, endpoint = fake
        monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
        monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
        with pytest.raises(ValueError):
            S3ObjectStore(state.bucket, endpoint=endpoint, scheme="http")


class TestEngineOverS3:
    def test_ingest_flush_query_merge_roundtrip(self, fake):
        state, endpoint = fake
        client = make_client(state, endpoint)
        data_store = ObjectStoreDataStore(client)
        meta_store = ObjectStoreMetaStore(client)
        config = bs.BloomSearchEngineConfig(
            row_data_compression="none", probe_backend="host"
        )
        engine = bs.BloomSearchEngine(config, meta_store, data_store)
        engine.start()
        try:
            for batch in range(3):
                engine.ingest_rows(
                    [
                        {"n": batch * 100 + i, "w": f"word{batch * 100 + i}"}
                        for i in range(100)
                    ],
                    timeout=TIMEOUT,
                )
                engine.flush(timeout=TIMEOUT)
            got = engine.query_sync(bs.new_query().token("word142").build(), timeout=TIMEOUT)
            assert got == [{"n": 142, "w": "word142"}]
            # Merge over HTTP: CAS manifest + lease + tombstones.
            engine.merge()
            assert len(meta_store.get_maybe_files_for_query(None)) == 1
            got = engine.query_sync(bs.new_query().token("word7").build(), timeout=TIMEOUT)
            assert got == [{"n": 7, "w": "word7"}]
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_merge_lease_over_http(self, fake):
        state, endpoint = fake
        client = make_client(state, endpoint)
        meta = ObjectStoreMetaStore(client)
        lease = meta.acquire_merge_lease(ttl_seconds=60)
        assert lease is not None
        assert meta.acquire_merge_lease(ttl_seconds=60) is None  # held
        lease.release()
        lease2 = meta.acquire_merge_lease(ttl_seconds=60)
        assert lease2 is not None
        lease2.release()
