"""Multi-writer coordination: merge leases.

The reference sketches a ``CoordinatedMetaStore`` exposing leases so multiple
writers can merge against shared storage without racing (README.md:279-281 —
design only, never implemented). Implemented here:

- :class:`CoordinatedMetaStore` — the protocol: a MetaStore that can also
  grant exclusive, expiring merge leases.
- :class:`FileLeaseCoordinator` — filesystem implementation using an
  O_CREAT|O_EXCL lease file with an expiry timestamp (works on any shared
  filesystem; object-store backends would implement the same protocol with
  conditional puts).

``BloomSearchEngine.merge`` acquires the lease automatically when its
MetaStore provides one, so concurrent mergers on shared storage serialize
and a crashed merger's lease expires rather than wedging the system.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Optional, Protocol, runtime_checkable


class Lease:
    """An exclusive, expiring right to run a merge."""

    def __init__(self, release_fn, lease_id: str, expires_at: float):
        self._release = release_fn
        self.lease_id = lease_id
        self.expires_at = expires_at

    def valid(self) -> bool:
        return time.time() < self.expires_at

    def release(self) -> None:
        self._release()

    def __enter__(self) -> "Lease":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


@runtime_checkable
class MergeCoordinator(Protocol):
    def acquire_merge_lease(self, ttl_seconds: float = 300.0) -> Optional[Lease]:
        """Try to acquire the exclusive merge lease; None if someone holds it."""
        ...


class FileLeaseCoordinator:
    """Lease via an exclusive lease file on a (shared) filesystem.

    The lease file holds ``lease_id expires_at``; acquisition atomically
    creates it (O_EXCL) or steals it if the recorded expiry passed (crashed
    holder). Release deletes only if we still own it.
    """

    def __init__(self, root_dir: str, name: str = "merge.lease"):
        os.makedirs(root_dir, exist_ok=True)
        self._path = os.path.join(root_dir, name)

    def acquire_merge_lease(self, ttl_seconds: float = 300.0) -> Optional[Lease]:
        lease_id = uuid.uuid4().hex
        expires_at = time.time() + ttl_seconds
        payload = f"{lease_id} {expires_at}".encode()
        try:
            fd = os.open(self._path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, payload)
            os.close(fd)
        except FileExistsError:
            if not self._try_steal_expired():
                return None
            try:
                fd = os.open(self._path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, payload)
                os.close(fd)
            except FileExistsError:
                return None  # someone else won the steal race

        def release():
            try:
                with open(self._path, "rb") as fh:
                    current = fh.read()
                if current.split(b" ", 1)[0] == lease_id.encode():
                    os.remove(self._path)
            except (FileNotFoundError, ValueError):
                pass

        return Lease(release, lease_id, expires_at)

    def _try_steal_expired(self) -> bool:
        try:
            with open(self._path, "rb") as fh:
                _, expiry_text = fh.read().split(b" ", 1)
            if time.time() > float(expiry_text):
                os.remove(self._path)
                return True
        except (FileNotFoundError, ValueError, OSError):
            # Malformed or vanished: treat as stealable.
            try:
                os.remove(self._path)
            except FileNotFoundError:
                pass
            return True
        return False
