"""In-process fake S3 server speaking the subset bloomsearch_tpu.s3 uses.

Runs a ThreadingHTTPServer on 127.0.0.1 and VERIFIES every request's SigV4
signature by recomputing it from the parsed request with the same
module-level signer the client uses — canonicalization bugs on either side
fail loudly as 403. Implements GET (+Range), HEAD, PUT (If-Match /
If-None-Match), DELETE (If-Match), and ListObjectsV2 with continuation
tokens; supports injected 503s for retry tests.
"""

from __future__ import annotations

import hashlib
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from bloomsearch_tpu.s3 import sigv4_headers


class FakeS3State:
    def __init__(self, bucket: str, access_key: str, secret_key: str):
        self.bucket = bucket
        self.access_key = access_key
        self.secret_key = secret_key
        self.lock = threading.Lock()
        self.objects: dict[str, tuple[bytes, str]] = {}
        self.fail_next = 0  # inject N 503 responses
        self.ignore_range = False  # serve 200 + full body to ranged GETs
        self.requests = 0


def _etag_of(data: bytes) -> str:
    return hashlib.md5(data).hexdigest()


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    state: FakeS3State  # set by start_fake_s3

    def log_message(self, *args):  # quiet
        pass

    # -- signature verification -------------------------------------------

    def _verify_sig(self, body: bytes) -> bool:
        auth = self.headers.get("Authorization", "")
        if not auth.startswith("AWS4-HMAC-SHA256 "):
            return False
        try:
            parts = dict(
                p.strip().split("=", 1) for p in auth[len("AWS4-HMAC-SHA256 "):].split(",")
            )
            credential = parts["Credential"]
            signed_headers = parts["SignedHeaders"]
            access_key, datestamp, region, service, _term = credential.split("/")
        except (KeyError, ValueError):
            return False
        if access_key != self.state.access_key or service != "s3":
            return False
        payload_hash = self.headers.get("x-amz-content-sha256", "")
        if payload_hash != hashlib.sha256(body).hexdigest():
            return False
        path, _, query = self.path.partition("?")
        # Rebuild the signed header set from the actual request.
        headers = {}
        for name in signed_headers.split(";"):
            value = self.headers.get(name)
            if value is None:
                return False
            if name in ("host", "x-amz-date", "x-amz-content-sha256",
                        "x-amz-security-token"):
                continue  # the signer adds these itself
            headers[name] = value
        import datetime

        amz_date = self.headers.get("x-amz-date", "")
        try:
            now = datetime.datetime.strptime(amz_date, "%Y%m%dT%H%M%SZ").replace(
                tzinfo=datetime.timezone.utc
            )
        except ValueError:
            return False
        if now.strftime("%Y%m%d") != datestamp:
            return False
        expected = sigv4_headers(
            self.command, self.headers.get("host", ""), path, query, headers,
            payload_hash, region=region, access_key=access_key,
            secret_key=self.state.secret_key,
            session_token=self.headers.get("x-amz-security-token"),
            now=now,
        )
        return expected["Authorization"] == auth

    # -- plumbing ------------------------------------------------------------

    def _read_body(self) -> bytes:
        length = int(self.headers.get("Content-Length", "0") or "0")
        return self.rfile.read(length) if length else b""

    def _respond(self, status: int, body: bytes = b"", headers=None, *, head=False):
        self.send_response(status)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body and not head:
            self.wfile.write(body)

    def _key(self) -> str:
        path = urllib.parse.unquote(self.path.partition("?")[0])
        prefix = f"/{self.state.bucket}/"
        if path == f"/{self.state.bucket}":
            return ""
        if not path.startswith(prefix):
            return "\x00invalid"
        return path[len(prefix):]

    def _gate(self, body: bytes) -> bool:
        """Common checks; True when the request may proceed."""
        self.state.requests += 1
        with self.state.lock:
            if self.state.fail_next > 0:
                self.state.fail_next -= 1
                self._respond(503, b"<Error><Code>SlowDown</Code></Error>")
                return False
        if not self._verify_sig(body):
            self._respond(403, b"<Error><Code>SignatureDoesNotMatch</Code></Error>")
            return False
        return True

    def _check_preconditions(self, key: str) -> bool:
        """If-Match / If-None-Match vs current object; respond + False on fail."""
        current = self.state.objects.get(key)
        if self.headers.get("If-None-Match") == "*" and current is not None:
            self._respond(412, b"<Error><Code>PreconditionFailed</Code></Error>")
            return False
        if_match = self.headers.get("If-Match")
        if if_match is not None:
            etag = if_match.strip('"')
            if current is None or current[1] != etag:
                self._respond(412, b"<Error><Code>PreconditionFailed</Code></Error>")
                return False
        return True

    # -- methods ---------------------------------------------------------------

    def do_PUT(self):
        body = self._read_body()
        if not self._gate(body):
            return
        key = self._key()
        with self.state.lock:
            if not self._check_preconditions(key):
                return
            etag = _etag_of(body)
            self.state.objects[key] = (body, etag)
        self._respond(200, headers={"ETag": f'"{etag}"'})

    def do_DELETE(self):
        body = self._read_body()
        if not self._gate(body):
            return
        key = self._key()
        with self.state.lock:
            if self.headers.get("If-Match") is not None:
                if key not in self.state.objects:
                    self._respond(404, b"<Error><Code>NoSuchKey</Code></Error>")
                    return
                if not self._check_preconditions(key):
                    return
            self.state.objects.pop(key, None)
        self._respond(204)

    def _serve_object(self, *, head: bool):
        key = self._key()
        with self.state.lock:
            current = self.state.objects.get(key)
        if current is None:
            self._respond(404, b"<Error><Code>NoSuchKey</Code></Error>", head=head)
            return
        data, etag = current
        rng = self.headers.get("Range")
        status = 200
        if self.state.ignore_range:
            rng = None  # a proxy/server that drops the Range header
        if rng and rng.startswith("bytes="):
            spec = rng[len("bytes="):]
            start_s, _, end_s = spec.partition("-")
            start = int(start_s)
            if start >= len(data):
                self._respond(416, b"<Error><Code>InvalidRange</Code></Error>", head=head)
                return
            end = min(int(end_s), len(data) - 1) if end_s else len(data) - 1
            data = data[start : end + 1]
            status = 206
        self._respond(
            status, data,
            headers={"ETag": f'"{etag}"', "Content-Type": "application/octet-stream"},
            head=head,
        )

    def do_HEAD(self):
        if not self._gate(b""):
            return
        self._serve_object(head=True)

    def do_GET(self):
        if not self._gate(b""):
            return
        path, _, query = self.path.partition("?")
        params = dict(urllib.parse.parse_qsl(query))
        if params.get("list-type") == "2" and path == f"/{self.state.bucket}":
            prefix = params.get("prefix", "")
            max_keys = int(params.get("max-keys", "1000"))
            after = params.get("continuation-token", "")
            with self.state.lock:
                keys = sorted(k for k in self.state.objects if k.startswith(prefix))
            if after:
                keys = [k for k in keys if k > after]
            page, rest = keys[:max_keys], keys[max_keys:]
            items = "".join(f"<Contents><Key>{k}</Key></Contents>" for k in page)
            truncated = "true" if rest else "false"
            token = (
                f"<NextContinuationToken>{page[-1]}</NextContinuationToken>"
                if rest
                else ""
            )
            xml = (
                '<?xml version="1.0"?><ListBucketResult>'
                f"<IsTruncated>{truncated}</IsTruncated>{token}{items}"
                "</ListBucketResult>"
            ).encode()
            self._respond(200, xml, headers={"Content-Type": "application/xml"})
            return
        self._serve_object(head=False)


def start_fake_s3(
    bucket: str = "testbucket",
    access_key: str = "AKIAFAKE",
    secret_key: str = "fakesecretfakesecret",
    max_keys: int = 1000,
):
    """-> (state, server, 'host:port'). Caller must server.shutdown()."""
    state = FakeS3State(bucket, access_key, secret_key)
    handler = type("BoundHandler", (_Handler,), {"state": state})
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address
    return state, server, f"{host}:{port}"
