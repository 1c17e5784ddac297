"""BloomSearchEngine: ingest → flush → query runtime.

The runtime equivalent of the reference's bloom_tree_engine.go, restructured
for the bank-oriented file format and batched (device-friendly) probing:

- **Ingest** (single-writer actor thread — reference :348-414): rows are
  partitioned, expanded into the three keyspaces, batch-hashed once per
  request (the native C++ batch hasher replaces the per-key Go murmur3
  calls), and appended to per-partition compressed row buffers. Flush
  triggers mirror the reference exactly (:616-650): partition row/byte caps,
  buffer row/byte/time caps, force-flush, and a periodic time check.
- **Flush** (dedicated thread, queue of 1, inline when full — :677-724):
  writes an immutable file (blocks + filter banks + footer) and atomically
  publishes it via ``MetaStore.update``.
- **Query** (:934-1204): prefilter via MetaStore → *batched* file-level bloom
  probe (all candidate files at once, grouped by bloom params) → *batched*
  block-level bank probe (every block of a file in one pass) → bounded worker
  pool decodes only surviving blocks, re-verifies every row exactly, and
  streams results. Memory scales with concurrency, not result size.

Streaming contract: results are posted to a caller-supplied ``queue.Queue``;
``None`` is the completion sentinel (the reference closes the channel).
Per-worker errors go to ``error_queue`` and that worker stops; others
continue. Stats are posted lossily (dropped when full), mirroring
``TryWriteChannel`` (chan_helpers.go:7-20).
"""

from __future__ import annotations

import contextlib
import json
import logging
import struct
import queue
import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor, wait as futures_wait
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Optional

import numpy as np

from .bloom.bank import BackendReleasedError
from .bloom.hashing import hash_keys
from .bloom.params import BloomParams
from .bloom.probe import (
    CompiledBloomTerms,
    compile_bloom_terms,
    evaluate_match_expression,
    probe_bank_host,
)
from .compression import (
    COMPRESSION_ZSTD,
    ALL_COMPRESSIONS,
    StreamEncoder,
    compression_available,
    decompress_block,
)
from .file_format import (
    BloomFilters,
    DataBlockMetadata,
    DataFileWriter,
    FileMetadata,
    encode_row,
    extract_block_filters,
    read_bank_group,
    read_block_rows_compressed,
    split_rows,
)
from .minmax import (
    MinMaxIndex,
    convert_to_min_max_int64,
    union_min_max_indexes,
    update_min_max_index,
)
from .query import BloomQuery, Query, and_bloom_queries, new_query, regex_field_guard_bloom_query
from .stores import DataStore, DeleteOperation, MaybeFile, MetaStore, WriteOperation
from .tokenizer import (
    ValueTokenizer,
    basic_whitespace_lower_tokenizer,
    compile_regex_query,
    make_field_token_key,
    row_matches_query,
    row_matches_regex_expression,
    unique_fields,
)

logger = logging.getLogger("bloomsearch_tpu.engine")

PartitionFunc = Callable[[dict], str]

MAX_ROW_BYTES = 0xFFFFFFFF

# Bank groups larger than this take the sparse cold-probe path (seek-read
# only the probed rows) instead of a full read on first touch.
SPARSE_BANK_BYTES = 4 * 1024 * 1024
# Per-merge-operation decoded-bank memo cap (see _execute_merge_group's
# bank_for): groups cap at max_files_to_merge_per_operation files, but per-
# file bank bytes are data-dependent, so bound by bytes not entries. Banks
# are zero-copy views over file bytes — the cap bounds retained reads.
_MERGE_BANK_CACHE_BYTES = 1 << 30
_LENGTH_PREFIX = struct.Struct("<I")


class InvalidConfigError(ValueError):
    pass


class StaleFileAssignmentError(RuntimeError):
    """A query restricted to ``file_pointers`` found some of them missing
    from this engine's metadata listing.

    Scatter/gather assigns disjoint file subsets from the COORDINATOR's
    metadata snapshot; if a merge/expiry publishes between that snapshot
    and the peer's own listing, the assigned file's rows now live in a
    replacement file that is in nobody's assignment. Silently returning
    the surviving subset would drop those rows from the gathered result —
    the peer must error instead, so the caller can retry the query against
    a consistent snapshot."""


class _ChurnBudget:
    """Token bucket bounding background cache-churn (~5%/min of capacity).

    Used for at-capacity background row pins and bank warms: when the
    working set exceeds a cache, refilling it per query is pure thrash —
    evict/upload cycles that never improve the hit rate but contend with
    foreground queries for transfer bandwidth and device time. The bucket
    starts empty (post-warmup caches are exactly as warm as they can get)
    and accrues `frac` of capacity per `period_s`, so a genuinely shifted
    hot set still migrates in within minutes.
    """

    def __init__(self, capacity_bytes: int, frac: float = 0.05, period_s: float = 60.0):
        self.burst = max(capacity_bytes, 0) * frac
        self.rate = self.burst / period_s
        self.tokens = 0.0
        self.t = time.monotonic()
        self.lock = threading.Lock()
        self.skipped = 0  # observability: denied admissions

    def admit(self, nbytes: int) -> bool:
        now = time.monotonic()
        with self.lock:
            self.tokens = min(self.tokens + (now - self.t) * self.rate, self.burst)
            self.t = now
            # Admit once a full burst (or the request, if smaller) has
            # accrued, letting tokens go negative for items larger than the
            # burst: a deficit bucket keeps the long-run rate exact while a
            # single 10 MB block can still migrate past a 6 MB burst —
            # `tokens >= nbytes` alone would deny it forever.
            if self.tokens >= min(float(nbytes), self.burst) and self.burst > 0:
                self.tokens -= nbytes
                return True
            self.skipped += 1
            return False

    def drain(self) -> None:
        """Empty the bucket (e.g. at warmup completion).

        The budget exists for the post-warmup steady state; tokens accrued
        while a multi-minute warmup ran would otherwise fund an immediate
        burst of pure-thrash refills the moment serving begins.
        """
        now = time.monotonic()
        with self.lock:
            self.tokens = min(self.tokens, 0.0)
            self.t = now


class _YieldBudget:
    """Thread-safe REFILLING allowance (token bucket) of seconds warmup may
    spend paused letting queries go first — shared by the main warm thread
    and the concurrent scan-compile thread.

    Round 4 used a fixed total (120 s): under a sustained during-warmup
    query stream it drained mid-warmup, after which warmup stopped yielding
    entirely and queries stalled 4-15 s behind pin uploads and locked warm
    launches for the REST of warmup (BENCH_r05 validation run: during-
    warmup p50 3.9 s, worst 15.7 s, with the stalls clustered after the
    early yields spent the budget). Refilling at ``rate`` seconds of pause
    per wall second keeps both properties (refill accrues during pauses
    too, so the long-run paused fraction converges to ``rate`` — it MUST
    be < 1 or a saturating stream pauses warmup forever):

    - bounded stretch: warmup pauses at most ``rate`` of wall time, so a
      saturating query stream stretches warmup <= 1/(1-rate)x
      (rate=0.5 -> at most 2x), never forever;
    - no starvation: a query arriving at ANY point in warmup finds pause
      tokens — the bucket refills continuously instead of dying.

    ``burst`` caps banked tokens so a long query-free stretch can't fund
    one unbounded pause later."""

    __slots__ = ("rate", "burst", "_tokens", "_t", "_lock")

    def __init__(self, burst: float, rate: float = 0.5):
        self.rate = rate
        self.burst = burst
        self._tokens = burst
        self._t = time.monotonic()
        self._lock = threading.Lock()

    def consume(self, dt: float) -> bool:
        """Spend ``dt`` seconds of pause; False while the bucket is dry
        (the caller should do one unit of warmup work, which itself banks
        refill time for the next yield point)."""
        with self._lock:
            now = time.monotonic()
            self._tokens = min(self.burst, self._tokens + (now - self._t) * self.rate)
            self._t = now
            if self._tokens < dt:
                return False
            self._tokens -= dt
            return True


def _default_compression() -> str:
    from .compression import COMPRESSION_SNAPPY, compression_available

    return COMPRESSION_SNAPPY if compression_available(COMPRESSION_SNAPPY) else COMPRESSION_ZSTD


def _native_ingest_available() -> bool:
    from . import native

    return native.available()


def _native_tokenize(serialized: list[bytes], delimiter: str):
    """Call the native batch tokenizer over already-serialized rows."""
    from . import native

    lengths = np.fromiter((len(b) for b in serialized), dtype=np.int64, count=len(serialized))
    offsets = np.zeros(len(serialized), dtype=np.int64)
    if len(serialized) > 1:
        np.cumsum(lengths[:-1], out=offsets[1:])
    data = b"".join(serialized)
    return native.ingest_tokenize(data, offsets, lengths, delimiter)


@dataclass
class BloomSearchEngineConfig:
    """Engine configuration (reference BloomSearchEngineConfig, :158-229).

    Defaults match the reference's ``DefaultBloomSearchEngineConfig`` except
    ``row_data_compression`` defaults to zstd when the native snappy codec is
    unavailable.
    """

    tokenizer: ValueTokenizer = basic_whitespace_lower_tokenizer
    partition_func: Optional[PartitionFunc] = None

    min_max_indexes: list[str] = dc_field(default_factory=list)

    max_row_group_bytes: int = 10 * 1024 * 1024
    max_row_group_rows: int = 10_000
    max_file_size: int = 10 * 1024 * 1024 * 1024

    max_buffered_rows: int = 1_000
    max_buffered_bytes: int = 1 * 1024 * 1024
    max_buffered_time: float = 10.0  # seconds; designed for async writing

    ingest_buffer_size: int = 1_000

    # Max data blocks processed concurrently across ALL queries (global bound).
    max_query_concurrency: int = 1_000

    file_bloom_expected_items: int = 100_000
    bloom_false_positive_rate: float = 0.001

    # Block filters are sized by the row-group row cap like the reference
    # (:518-520) — but each row inserts many distinct keys (fields + tokens +
    # field:token pairs), so high-cardinality data saturates filters sized
    # that way (the reference's own benchmark degrades to full scans for
    # this reason). Set this to the expected distinct KEYS per block to keep
    # the configured FPR honest; "auto" measures keys/row during ingest and
    # sizes each NEW block buffer accordingly (self-correcting where the
    # reference silently degrades); None keeps reference-parity sizing.
    block_bloom_expected_items: Optional[int | str] = None

    # Default to snappy for fast decompression like the reference
    # (bloom_tree_engine.go:223-224); falls back to zstd if the native
    # snappy codec isn't built.
    row_data_compression: str = dc_field(default_factory=lambda: _default_compression())
    zstd_compression_level: int = 3

    max_files_to_merge_per_operation: int = 10

    # TTL for ingested rows; expired blocks are dropped during merge
    # (README.md:283-287 — designed but unimplemented in the reference).
    ttl_seconds: Optional[float] = None

    # Conditioned expiry (README.md:285: "based on partition ID, minmax
    # indexes, or row group age"): a predicate over DataBlockMetadata; any
    # block it returns True for is dropped during merge, in addition to
    # age expiry. Build one from a prefilter with
    # ``prefilter_expiry(partition(...) / min_max(...))`` or pass any
    # callable (it's a code hook like tokenizer/partition_func).
    ttl_predicate: Optional[Callable[[DataBlockMetadata], bool]] = None

    # Background compaction: run merge() on this interval (None = manual
    # merges only, the reference's model). Lease-aware when the MetaStore
    # coordinates.
    merge_interval_seconds: Optional[float] = None

    # TPU probe backend: "auto" uses the device when JAX has one, "device"
    # forces it, "host" forces numpy probing.
    probe_backend: str = "auto"
    bank_cache_bytes: int = 2 * 1024 * 1024 * 1024

    # Per-query cap on SYNCHRONOUS residency promotion: a query that finds
    # candidate bank groups non-resident may upload at most this many bytes
    # inline; groups past the cap are probed on host THIS query (disk read
    # + numpy — the reference's per-query speed) and promoted by a
    # background warm for the next one. Unbounded promotion made first-
    # query latency nondeterministic (an 18x swing across runs: through a
    # tunneled chip every inline upload queues ahead of the query's own
    # result fetches). 0 = never promote inline.
    bank_promote_bytes_per_query: int = 32 * 1024 * 1024

    # Devices for the sharded device probe: superbanks shard their block
    # axis over a 1-D jax mesh, so filter capacity and probe bandwidth scale
    # linearly in chips (the reference's data-parallel block pool mapped to
    # ICI; bloom_tree_engine.go:1019-1054). None = all visible devices when
    # more than one; 1 = single-device.
    mesh_devices: Optional[int] = None

    # Bloom filter bit layout: "classic" = reference-parity KM positions;
    # "blocked256" = split-block layout where a key's k bits share one
    # 256-bit aligned block — the device probe then fetches one row-group
    # per term instead of per probe (~k x less HBM traffic) at a small,
    # empirically-validated FPR cost.
    bloom_layout: str = "classic"

    # Serving mode: pin hot blocks' decompressed rows in HBM and run the
    # candidate scan on-device (rowcache.py). 0 disables; only effective
    # when the device probe backend is active.
    row_cache_bytes: int = 0

    # Restart sidecar cache directory (servingcache.py): persists each
    # pinned block's packed stream chunks / candidate flags / row
    # coordinates — pure functions of the immutable file bytes — so an
    # engine restart skips the decode+pack pass and warmup cost collapses
    # to the h2d upload floor (+ jit-cache reads). None disables. The
    # directory is a cache: safe to delete, grows to ~1.07x the raw bytes
    # ever pinned, entries invalidate with their file's tombstone.
    serving_cache_dir: Optional[str] = None

    # Cold-block pins happen OFF the query's critical path when the native
    # pipeline already produced the scan result inline (the pin is then a
    # pure cache-warm upload — hundreds of ms through remote-attached
    # chips). False pins synchronously (deterministic cache state after
    # every query; tests use it).
    row_cache_async_pins: bool = True

    # Host shadow policy for pinned blocks. False = shadow-free: only
    # offset/length/flag arrays stay host-side and candidate rows re-read
    # from the store at extraction time (ranged reads + chunk-granular
    # snappy decode) — serving host memory drops from ~1.2x raw to a few %.
    # True = keep the decompressed bytes host-side (no store reads on the
    # query path — right when the store is remote/slow). "auto" = shadow-
    # free iff the data store advertises supports_fast_ranged_reads
    # (FileSystemDataStore does; object stores pay a network GET per read).
    row_cache_host_shadow: Any = "auto"

    # Shared block-decode pool size (None = policy below). The fused native
    # pipeline releases the GIL, so ~1 worker per core saturates CPU and a
    # 2x oversubscription covers disk stalls; measure YOUR host with
    # `python -m bloomsearch_tpu.perf scaling` and set this from data.
    block_pool_workers: Optional[int] = None

    # Warm the engine at start(): pre-load existing files' filter banks,
    # pre-compile the device probe (and serving-mode scan) programs, and —
    # in serving mode — pre-pin rows, all on the background warm thread, so
    # the FIRST query doesn't pay jit-compile + upload (the reference has
    # no cold/warm cliff; without this the first needle query costs ~18x a
    # warm one on TPU). Off by default: short-lived embedders shouldn't pay
    # warmup for data they may never query.
    warmup_on_start: bool = False

    delimiter: str = "."

    @property
    def file_bloom_params(self) -> BloomParams:
        return BloomParams(
            self.file_bloom_expected_items, self.bloom_false_positive_rate, self.bloom_layout
        )

    @property
    def block_bloom_params(self) -> BloomParams:
        # Block filters are sized by the row-group cap (reference :518-520)
        # unless block_bloom_expected_items overrides it ("auto" resolves
        # per buffer in _IngestState from measured keys/row; this property
        # is its cold-start fallback).
        n = self.block_bloom_expected_items or self.max_row_group_rows
        if n == "auto":
            n = self.max_row_group_rows
        return BloomParams(n, self.bloom_false_positive_rate, self.bloom_layout)


def default_config() -> BloomSearchEngineConfig:
    return BloomSearchEngineConfig()


@dataclass
class BlockStats:
    """Per-block query stats, streamed lossily (reference :137-146)."""

    file_pointer: bytes
    block_offset: int
    rows_processed: int = 0
    bytes_processed: int = 0
    total_rows: int = 0
    total_bytes: int = 0
    duration: float = 0.0
    bloom_filter_skipped: bool = False


@dataclass
class MergeStats:
    """Merge operation stats (reference :148-156)."""

    files_processed: int = 0
    row_groups_processed: int = 0
    rows_processed: int = 0
    bytes_processed: int = 0
    duration: float = 0.0
    rows_per_second: float = 0.0
    bytes_per_second: float = 0.0


def prefilter_expiry(expression) -> Callable[[DataBlockMetadata], bool]:
    """Build a conditioned-TTL predicate from a prefilter expression.

    A block expires when the partition/minmax prefilter matches its
    metadata (README.md:285's "based on partition ID [or] minmax indexes")
    — but with **whole-block** semantics, NOT the query path's
    block-overlap semantics: a minmax condition must hold for the block's
    ENTIRE [min, max] range (e.g. ``numeric_less_than(cutoff)`` expires
    only blocks whose max is below the cutoff). Overlap semantics would
    delete blocks still containing live rows; deletion must only ever
    under-approximate. Blocks missing the referenced metadata never expire.

    Example: drop everything in partition "2024-01" whose ``ts`` range is
    entirely below a cutoff::

        config.ttl_predicate = prefilter_expiry(prefilter_and(
            partition(partition_equals("2024-01")),
            min_max("ts", numeric_less_than(CUTOFF)),
        ))
    """
    from .query import (
        NumericCondition,
        Operator,
        PrefilterConditionType,
        PrefilterExpression,
        PrefilterExprType,
        QueryPrefilter,
        evaluate_string_condition,
    )

    expr = (
        expression.expression
        if isinstance(expression, QueryPrefilter)
        else expression
    )

    def whole_range_holds(lo: int, hi: int, cond: NumericCondition) -> bool:
        """Does the condition hold for EVERY value in [lo, hi]?"""
        op = cond.operator
        if op == Operator.EQ:
            return lo == hi == cond.value
        if op == Operator.NE:
            return cond.value < lo or cond.value > hi
        if op == Operator.GT:
            return lo > cond.value
        if op == Operator.GTE:
            return lo >= cond.value
        if op == Operator.LT:
            return hi < cond.value
        if op == Operator.LTE:
            return hi <= cond.value
        if op == Operator.IN:
            return lo == hi and lo in cond.values
        if op == Operator.NOT_IN:
            return all(v < lo or v > hi for v in cond.values)
        if op == Operator.BETWEEN:
            return cond.min <= lo and hi <= cond.max
        if op == Operator.NOT_BETWEEN:
            return hi < cond.min or lo > cond.max
        return False

    def visit(e: Optional[PrefilterExpression], block: DataBlockMetadata) -> bool:
        if e is None:
            return False  # no condition: nothing expires
        if e.expression_type == PrefilterExprType.AND:
            # Empty AND is vacuously true in LOGIC, but expiry must only
            # ever under-approximate: prefilter_and() from a dynamically
            # assembled (and accidentally empty) condition list would
            # otherwise expire EVERY block in the store.
            return all(visit(c, block) for c in e.children) if e.children else False
        if e.expression_type == PrefilterExprType.OR:
            return any(visit(c, block) for c in e.children)
        cond = e.condition
        if cond is None:
            return False
        if cond.condition_type == PrefilterConditionType.PARTITION:
            return evaluate_string_condition(block.partition_id, cond.partition_condition)
        index = (block.min_max_indexes or {}).get(cond.min_max_field_name)
        if index is None:
            return False  # unprovable: never expire
        return whole_range_holds(index.min, index.max, cond.min_max_condition)

    def expired(block: DataBlockMetadata) -> bool:
        return visit(expr, block)

    return expired


def try_put(q: Optional[queue.Queue], item) -> bool:
    """Non-blocking, lossy put (reference TryWriteChannel, chan_helpers.go:7-20)."""
    if q is None:
        return False
    try:
        q.put_nowait(item)
        return True
    except queue.Full:
        return False


class _PartitionBuffer:
    """Per-partition in-flight block state (reference partitionBuffer :192-202)."""

    __slots__ = (
        "partition_id",
        "row_count",
        "min_max_indexes",
        "filters",
        "encoder",
        "created_at_ms",
        "params",
        "rows_canonical",
    )

    def __init__(self, partition_id: str, params: BloomParams, compression: str, zstd_level: int):
        self.partition_id = partition_id
        self.row_count = 0
        self.min_max_indexes: dict[str, MinMaxIndex] = {}
        self.filters = BloomFilters.from_params(params)
        self.encoder = StreamEncoder(compression, zstd_level)
        self.created_at_ms = int(time.time() * 1000)
        # Recorded in block metadata at flush (auto sizing varies per buffer).
        self.params = params
        # True while every buffered row is the engine's own canonical
        # serialization (dict-ingest path); ingest_serialized flips it —
        # the scan pre-filter may prune numeric tokens only on canonical
        # blocks (token "100000" has no substring in verbatim bytes "1e5").
        self.rows_canonical = True

    @property
    def uncompressed_size(self) -> int:
        return self.encoder.uncompressed_len


class _IngestRequest:
    __slots__ = ("rows", "done", "force_flush", "serialized", "partition_id")

    def __init__(
        self,
        rows,
        done: Optional[Future],
        force_flush: bool = False,
        serialized: bool = False,
        partition_id: str = "",
    ):
        self.rows = rows
        self.done = done
        self.force_flush = force_flush
        self.serialized = serialized
        self.partition_id = partition_id


class _FlushRequest:
    __slots__ = ("partition_buffers", "done_futures", "file_filters")

    def __init__(self, partition_buffers, done_futures, file_filters):
        self.partition_buffers = partition_buffers
        self.done_futures = done_futures
        self.file_filters = file_filters


_STOP = object()


def _resolve(futures, error: Optional[BaseException]) -> None:
    """Signal all pending done-futures (reference SendToChannelsWithContext)."""
    for f in futures:
        if f is None or f.done():
            continue
        if error is None:
            f.set_result(None)
        else:
            f.set_exception(error)


@dataclass
class _DataBlockJob:
    """A (file, block) unit of query work (reference dataBlockJob :28-31)."""

    file_pointer: bytes
    block: DataBlockMetadata


@dataclass
class _NativeVerifyPlan:
    """Compiled-once inputs for native exact row verification.

    Built per query when the tokenizer/delimiter are the defaults the C++
    walker replicates; ``conds`` are the bloom query's leaf conditions as
    (kind, field bytes, token bytes). The native walk either agrees
    bit-exactly with tokenizer.py (the semantic spec ≙ reference
    tokenizer.go:107-456) or flags the row for Python fallback.
    """

    expression: Any  # BloomExpression evaluated over the per-cond match rows
    terms: CompiledBloomTerms
    conds: list[tuple[int, bytes, bytes]]
    delimiter: int


class _HostFileBank:
    """Incremental file-level filter bank for one (m, k, layout) group.

    Files are immutable, so each file's filter triple occupies a fixed
    column: new files append into free columns, tombstoned files free
    theirs, and a query probes the whole bank once then selects its
    candidates' columns. This replaces restacking EVERY candidate file's
    filters whenever the file set changes (at 100k-item file filters that
    was ~0.5 MB of memcpy per file per flush/merge).

    Not thread-safe; the engine serializes access with a lock.
    """

    __slots__ = ("num_words", "bank", "cols", "free")

    def __init__(self, num_words: int):
        self.num_words = num_words
        self.bank = np.zeros((3, num_words, 0), dtype=np.uint32)
        self.cols: dict[bytes, int] = {}
        self.free: list[int] = []

    def ensure(self, group_files) -> tuple[np.ndarray, np.ndarray]:
        """-> (bank snapshot, per-file column indices aligned to group_files)."""
        missing = [mf for mf in group_files if mf.pointer not in self.cols]
        if missing:
            deficit = len(missing) - len(self.free)
            if deficit > 0:
                old_cap = self.bank.shape[2]
                grow = max(deficit, old_cap, 16)
                self.bank = np.concatenate(
                    [self.bank, np.zeros((3, self.num_words, grow), dtype=np.uint32)],
                    axis=2,
                )
                self.free.extend(range(old_cap, old_cap + grow))
            for mf in missing:
                col = self.free.pop()
                triple = mf.metadata.bloom_filters
                self.bank[0, :, col] = triple.field.words
                self.bank[1, :, col] = triple.token.words
                self.bank[2, :, col] = triple.field_token.words
                self.cols[mf.pointer] = col
        idx = np.fromiter(
            (self.cols[mf.pointer] for mf in group_files),
            dtype=np.int64,
            count=len(group_files),
        )
        return self.bank, idx

    def remove(self, pointer: bytes) -> None:
        col = self.cols.pop(pointer, None)
        if col is not None:
            # Zero so a freed column can never probe true before reuse.
            self.bank[:, :, col] = 0
            self.free.append(col)


class BloomSearchEngine:
    """The engine (reference BloomSearchEngine, bloom_tree_engine.go:121-135)."""

    def __init__(
        self,
        config: BloomSearchEngineConfig,
        meta_store: MetaStore,
        data_store: DataStore,
    ):
        if config.tokenizer is None:
            raise InvalidConfigError("tokenizer is required")
        if config.file_bloom_expected_items <= 0:
            raise InvalidConfigError("file_bloom_expected_items must be greater than 0")
        if not (0.0 < config.bloom_false_positive_rate < 1.0):
            raise InvalidConfigError("bloom_false_positive_rate must be between 0 and 1")
        if config.max_query_concurrency <= 0:
            raise InvalidConfigError("max_query_concurrency must be greater than 0")
        if config.row_data_compression not in ALL_COMPRESSIONS:
            raise InvalidConfigError(
                f"unknown compression type: {config.row_data_compression!r}"
            )
        if not compression_available(config.row_data_compression):
            raise InvalidConfigError(
                f"compression {config.row_data_compression!r} is not available"
            )
        if config.probe_backend not in ("auto", "device", "host"):
            raise InvalidConfigError("probe_backend must be auto|device|host")
        if config.bloom_layout not in ("classic", "blocked256"):
            raise InvalidConfigError("bloom_layout must be classic|blocked256")
        if config.mesh_devices is not None and config.mesh_devices < 1:
            raise InvalidConfigError("mesh_devices must be >= 1 (or None for auto)")
        if config.row_cache_host_shadow not in ("auto", True, False):
            raise InvalidConfigError('row_cache_host_shadow must be "auto", True, or False')
        if isinstance(config.block_bloom_expected_items, str):
            if config.block_bloom_expected_items != "auto":
                raise InvalidConfigError(
                    'block_bloom_expected_items must be an int, None, or "auto"'
                )
        elif (
            config.block_bloom_expected_items is not None
            and config.block_bloom_expected_items <= 0
        ):
            raise InvalidConfigError("block_bloom_expected_items must be > 0")
        # Documented divergence (file_format.read_block_rows_compressed):
        # decode buffers WHOLE blocks (compressed then decompressed), so
        # per-query peak memory scales with concurrency x this cap. The
        # reference streams LimitReader->decompressor and tolerates any
        # size (bloom_tree_engine.go:1120-1153); here GB-scale row groups
        # degrade abruptly — surface it at config time, not at OOM time.
        if config.max_row_group_bytes > 256 * 1024 * 1024:
            logger.warning(
                "max_row_group_bytes=%d: block decode buffers whole blocks "
                "in memory (peak ~ concurrency x cap; unlike the "
                "reference's streaming decode). Consider <= 256 MB row "
                "groups, or lower max_query_concurrency.",
                config.max_row_group_bytes,
            )

        self.config = config
        self.meta_store = meta_store
        self.data_store = data_store

        self._ingest_queue: queue.Queue = queue.Queue(maxsize=config.ingest_buffer_size)
        self._flush_queue: queue.Queue = queue.Queue(maxsize=1)
        self._stop_event = threading.Event()
        self._ingest_done = threading.Event()
        self._ingest_thread: Optional[threading.Thread] = None
        self._flush_thread: Optional[threading.Thread] = None
        self._merge_thread: Optional[threading.Thread] = None
        self._started = False

        # Global cross-query bound on concurrently processed blocks
        # (reference querySemaphore :134, :269).
        self._query_semaphore = threading.BoundedSemaphore(config.max_query_concurrency)

        # Shared bounded executor for block decode work across ALL queries
        # (the reference's goroutine pool under the global semaphore; Go
        # goroutines are free, Python threads are not — per-query thread
        # spawning meant ~9 threads per concurrent query). Threads spawn
        # lazily up to the cap. Sizing: the GIL-free native pipeline
        # saturates a core per worker, so 2x cores covers disk stalls
        # without oversubscription thrash (floor 8 keeps tiny hosts
        # concurrent for I/O-bound stores); measure with
        # `python -m bloomsearch_tpu.perf scaling` and override via
        # config.block_pool_workers.
        import os as _os

        workers = config.block_pool_workers
        if workers is None:
            workers = max(8, 2 * (_os.cpu_count() or 1))
        self._block_pool = ThreadPoolExecutor(
            max_workers=min(config.max_query_concurrency, workers),
            thread_name_prefix="bloomsearch-block",
        )

        self._device_backend = None
        if config.probe_backend in ("auto", "device"):
            try:
                from .bloom.bank import DeviceProbeBackend

                backend = DeviceProbeBackend(
                    cache_bytes=config.bank_cache_bytes,
                    require_device=(config.probe_backend == "device"),
                    mesh_devices=config.mesh_devices,
                )
                # "auto" only routes probes through JAX when an accelerator is
                # attached; on CPU-only hosts the numpy path is faster.
                if config.probe_backend == "device" or backend.platform == "tpu":
                    self._device_backend = backend
            except Exception as exc:  # no usable device — fall back to host
                if config.probe_backend == "device":
                    raise
                logger.debug("device probe backend unavailable: %s", exc)

        # Host shadow policy for pinned blocks (see config docstring) —
        # resolved BEFORE the row cache exists: the cache's stream
        # reservation splits the byte budget differently when every pin
        # carries a ~1x-of-raw host shadow.
        if config.row_cache_host_shadow == "auto":
            self._row_shadow = not getattr(
                data_store, "supports_fast_ranged_reads", False
            )
        else:
            self._row_shadow = bool(config.row_cache_host_shadow)

        self._row_cache = None
        if config.row_cache_bytes > 0 and self._device_backend is not None:
            from .rowcache import DeviceRowCache

            self._row_cache = DeviceRowCache(
                config.row_cache_bytes,
                mesh_devices=config.mesh_devices,
                host_shadow=self._row_shadow,
            )
        # Restart sidecar: persisted packed serving state (pure function of
        # immutable file bytes). Loads are skipped in shadow mode — a
        # sidecar hit has no decompressed bytes to retain host-side.
        self._serving_cache = None
        if config.serving_cache_dir and self._row_cache is not None:
            try:
                from .servingcache import ServingStateCache

                self._serving_cache = ServingStateCache(config.serving_cache_dir)
            except Exception:
                logger.exception("serving cache unavailable; decode+pack path only")
        # Warmup phase timings (reserve / first pins / programs / pins),
        # populated by _warmup_impl; exposed via stats()["warmup"].
        self._warmup_timeline: dict = {}
        # During-warmup serving gate: while warmup is active AND the scan
        # program pass hasn't finished, queries route pinned blocks through
        # the native DISK scan path instead of launching a device scan — a
        # device launch before its program exists jits inline for seconds
        # (the captured 15.7 s prescan stall at t=11 into warmup) while the
        # native path serves the same block in ~10-30 ms. Outside warmup
        # both events are clear, so on-demand jit behaves as before.
        self._warmup_active = threading.Event()
        self._warmup_scan_ready = threading.Event()
        self._warmup_probe_ready = threading.Event()
        # Background cache-warm pins (bounded; duplicates and overflow drop —
        # a dropped pin is just a cache miss that retries on a later query).
        self._bg_pins: set = set()
        self._bg_pin_lock = threading.Lock()
        # Churn budgets for background cache fills once a cache is full
        # (buckets start EMPTY so the minutes right after warmup fills them
        # don't immediately churn): one for row-stream pins, one for bank
        # warms — a working set beyond either cache must not evict/upload-
        # thrash it on every query.
        self._pin_churn = _ChurnBudget(config.row_cache_bytes)
        self._bank_churn = _ChurnBudget(config.bank_cache_bytes)
        self._pin_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="bloomsearch-bgpin"
        )

        # Incremental file-level filter banks per (m, k, layout) group:
        # columns append on first sight of a file and free on tombstone, so
        # file-set churn (flush/merge) never restacks surviving files'
        # filters.
        self._file_bank_cache: dict[tuple, _HostFileBank] = {}
        self._file_bank_lock = threading.Lock()

        # Host-side block-bank cache for the host probe path (the device
        # backend keeps its own HBM-resident cache); files are immutable so
        # entries key by (pointer, group offset). LRU bounded by
        # bank_cache_bytes.
        self._host_bank_cache: dict[tuple[bytes, int], np.ndarray] = {}
        self._host_bank_bytes = 0
        self._host_bank_lock = threading.Lock()

        # Merge tombstones defer while queries are in flight so a replaced
        # file can't vanish under a query that already planned jobs on it
        # (the reference errors those workers; we drain instead). Each defer
        # snapshots the queries active at that moment, so under continuous
        # query traffic entries still drain as those specific queries finish.
        self._saturation_warned = False
        self._file_saturation_warned = False
        # In-flight background bank warms (sparse cold-probe follow-ups).
        # One dedicated thread: warms stream the FULL banks from disk and
        # must never crowd the shared block pool (or the disk) that the
        # triggering query's decode tasks need.
        self._warming: set[tuple[bytes, int]] = set()
        self._warm_lock = threading.Lock()
        self._warm_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="bloomsearch-warm"
        )
        # Sparse cold-probe fan-out: pure seek-read I/O (KBs per file), so
        # a small pool keeps the disk queue full without meaningful CPU
        # cost. Shared across queries; sized for I/O overlap, not cores.
        self._sparse_probe_pool = ThreadPoolExecutor(
            max_workers=8, thread_name_prefix="bloomsearch-sparseprobe"
        )
        # Whole-file mmaps for the sparse probe path (filesystem stores
        # only): a warm sparse pass over a 400-file dataset is ~4k
        # seek+read syscalls per query via file handles and ~zero via
        # page-cache slices. Files are immutable so a mapping never goes
        # stale; tombstoned files' mappings age out of the LRU (dropping
        # the dict reference lets refcounting close the map — an explicit
        # close() could BufferError against an in-flight numpy view).
        self._bank_mmaps: dict[bytes, Any] = {}
        self._bank_mmap_lock = threading.Lock()
        # Per-query stage timing ring (last 128 queries): plan / probe /
        # prescan / block-task seconds + job counts. Cheap wall clocks on
        # the query thread only; the serving-operations benchmarks read it
        # to attribute tail latency (VERDICT r4: a 72.8 s during-warmup
        # query had no attribution).
        from collections import deque

        self._query_timings: deque = deque(maxlen=128)
        self._next_query_id = 0
        self._active_query_ids: set[int] = set()
        self._deferred_tombstones: list[tuple[bytes, set[int]]] = []
        self._query_track_lock = threading.Lock()
        # Signaled whenever a query finishes; stop() waits on it so deferred
        # tombstones never force-apply under an in-flight query.
        self._queries_drained = threading.Condition(self._query_track_lock)

    # ------------------------------------------------------------------
    # Lifecycle (reference Start/Stop :281-307)
    # ------------------------------------------------------------------

    def start(self) -> None:
        if self._started:
            raise RuntimeError("engine already started")
        if self._stop_event.is_set():
            # The workers observe _stop_event and would exit immediately —
            # a silently dead engine. Reference engines aren't restartable
            # either (tests construct a new engine per run); fail loudly.
            raise RuntimeError(
                "engine cannot be restarted after stop(); construct a new one"
            )
        self._started = True
        self._ingest_thread = threading.Thread(
            target=self._ingest_worker, name="bloomsearch-ingest", daemon=True
        )
        self._flush_thread = threading.Thread(
            target=self._flush_worker, name="bloomsearch-flush", daemon=True
        )
        self._ingest_thread.start()
        self._flush_thread.start()
        if self.config.merge_interval_seconds is not None:
            self._merge_thread = threading.Thread(
                target=self._merge_loop, name="bloomsearch-merge", daemon=True
            )
            self._merge_thread.start()
        if self.config.warmup_on_start:
            self.warmup(block=False)

    def warmup(self, block: bool = True, timeout: Optional[float] = None):
        """Pre-warm so the FIRST query runs at warm-query speed.

        Loads every existing file's filter banks into the device (or host)
        cache, compiles the device probe program per resident superbank
        shape, and — in serving mode — pre-pins rows up to the cache budget
        and compiles the batched scan program. The reference engine has no
        cold/warm cliff (filters stream from disk per query); the bank/jit
        design trades that for a first-touch cost this hook pays up front.

        Runs on the dedicated warm thread. ``block=False`` returns the
        Future (start() uses this); errors are logged, never raised — a
        failed warm only means the first query pays the cold cost.
        """
        fut = self._warm_pool.submit(self._warmup_impl)
        if not block:
            return fut
        fut.result(timeout=timeout)
        return None

    def _warmup_impl(self) -> None:
        self._warmup_active.set()
        self._warmup_scan_ready.clear()
        self._warmup_probe_ready.clear()
        try:
            self._warmup_impl_body()
        finally:
            self._warmup_active.clear()

    def _warmup_impl_body(self) -> None:
        try:
            maybe_files = self.meta_store.get_maybe_files_for_query(None)
        except Exception:
            logger.exception("warmup: file listing failed")
            return

        # File-level banks (host numpy; the per-query incremental path).
        file_groups: dict[tuple, list] = {}
        for mf in maybe_files:
            triple = mf.metadata.bloom_filters
            if triple is not None:
                file_groups.setdefault(
                    (triple.field.m_bits, triple.field.k, triple.field.layout), []
                ).append(mf)
        for key, group_files in file_groups.items():
            try:
                self._file_level_bank(key, group_files)
            except Exception:
                logger.exception("warmup: file-level bank build failed")

        # Serving mode, incremental (VERDICT r3 item 5): RESERVE the stream
        # matrix at its final capacity (derivable from block metadata), pin
        # just a few representative blocks, and compile every scan program
        # on that final shape BEFORE the long pin pass — a query arriving
        # mid-warmup then runs warm-shaped programs and pulls its own
        # blocks in on demand (the query-path pin jumps the warmup queue
        # naturally; the remaining pins stream in on a background thread
        # CONCURRENTLY with the bank loads + probe compiles below).
        t0 = time.monotonic()
        timeline = self._warmup_timeline = {}

        # Prime the host bank LRU FIRST (device backend only): until the
        # probe-cold gate lifts, queries host-probe the small (non-sparse-
        # capable) groups, and the first such query otherwise pays one cold
        # ~hundreds-of-MB read while the pin pass hammers the same disk
        # (captured: 6.0 s). One uncontended sequential read now, bounded
        # by the bank budget, makes every gated probe a memory hit; the
        # copies are released when the gate lifts. Sparse-capable groups
        # (the beyond-budget regime's) bypass the host path entirely.
        if self._device_backend is not None:
            primed = 0
            try:
                for mf in maybe_files:
                    if self._stop_event.is_set():
                        return
                    for group in mf.metadata.bank_groups:
                        if (
                            group.size > SPARSE_BANK_BYTES
                            and group.row_crc_offset is not None
                        ):
                            continue
                        if primed + group.size > self.config.bank_cache_bytes:
                            break
                        if self._host_bank(mf.pointer, group) is None:
                            with self.data_store.open_file(mf.pointer) as fh:
                                self._host_bank_put(
                                    mf.pointer, group, read_bank_group(fh, group)
                                )
                            primed += group.size
                    else:
                        continue
                    break
            except FileNotFoundError:
                pass  # merged/tombstoned mid-listing: queries re-list
            except Exception:
                logger.exception("warmup: host bank prime failed")
            timeline["host_prime_s"] = round(time.monotonic() - t0, 3)

        first_pins: list = []
        pin_thread = None
        if self._row_cache is not None:
            total_chunks = 0
            from .rowcache import STREAM_STRIDE

            for mf in maybe_files:
                for blk in mf.metadata.data_blocks:
                    total_chunks += -(-max(blk.uncompressed_size, 1) // STREAM_STRIDE)
            try:
                timeline["reserved_chunks"] = self._row_cache.reserve(total_chunks)
            except Exception:
                logger.exception("warmup: stream reserve failed")
            timeline["reserve_s"] = round(time.monotonic() - t0, 3)
            # SIX first pins, not 4: the scan-route chooser goes sparse at
            # <=4 segments, so a 4-block warm list would compile ONLY
            # sparse-shaped programs in the pass below (n_real pinned at 8)
            # and leave every DENSE (n_real 1/2/4/8) program to the first
            # >=5-block query — measured as a ~1-1.5 s first-query cliff on
            # the 48 MB serving variant. With 6 pins the full-list scans go
            # dense while the [:1]/[:2]/[:3] subsets still cover sparse
            # segment buckets {1, 2, 4}.
            first_pins.extend(self._warmup_pin_rows(maybe_files, limit=6))
            timeline["first_pins_s"] = round(time.monotonic() - t0, 3)

            def _pin_rest():
                try:
                    self._warmup_pin_rows(maybe_files)
                except Exception:
                    logger.exception("warmup: row pin pass failed")

            pin_thread = threading.Thread(
                target=_pin_rest, name="bloomsearch-warm-pins", daemon=True
            )
            pin_thread.start()

        # Refilling pause allowance for letting queries go first (shared
        # across the bank-load, probe-compile and scan-compile loops below —
        # two warm threads draining one bucket just means yielding drains it
        # faster under query load). Warmup is background work: stretching it
        # under sustained query load is the right trade, bounded at <= 2x
        # (rate 0.5) so a saturating stream can't stall it forever.
        yield_budget = _YieldBudget(burst=30.0)

        # Scan programs compile on their own thread, CONCURRENTLY with the
        # bank uploads + probe compiles below — the two passes were each
        # ~100 s through a tunneled chip and share no program shapes (scan
        # launches coalesce through the rowcache combiner, probes through
        # the bank combiner; one serial warm stream per combiner keeps
        # every launch at exactly the shapes queries produce, while the two
        # streams overlap each other's compile/upload stalls). The pass
        # needs only first_pins, which exist already.
        scan_thread = None
        if self._row_cache is not None and first_pins:
            scan_thread = threading.Thread(
                target=self._warmup_scan_programs,
                args=(first_pins, yield_budget, timeline, t0),
                name="bloomsearch-warm-scans",
                daemon=True,
            )
            scan_thread.start()

        # Block banks: make groups resident (device superbanks or the host
        # cache) UP TO the bank cache budget — a beyond-budget dataset
        # (total banks > bank_cache_bytes, the >30 GB regime) would
        # otherwise thrash-load every group through LRU eviction during
        # warmup; the un-warmed tail is served by per-query sparse cold
        # probes instead. Remember one (pointer, gi) per (m, k, layout)
        # for the compile pass below.
        compile_reps: dict[tuple, tuple] = {}
        bank_budget_hit = False
        # Cumulative RAW bytes of groups this warmup has loaded. The budget
        # check must use this, not backend.total_bytes(): superbank capacity
        # PLATEAUS once LRU eviction starts recycling columns (xxlscale:
        # total_bytes saturated at 1.38 GB under a 2 GB budget while warmup
        # kept pushing all 24.4 GB of groups through the tunnel — every
        # insert past saturation evicts an earlier one, pure thrash; the
        # captured 823 s warmup was mostly this). total_bytes() still
        # participates for the capacity-padding case (a padded superbank
        # can exceed the budget before a budget's worth of raw bytes loads).
        bank_loaded_bytes = 0
        for mf in maybe_files:
            if self._stop_event.is_set():
                return
            for gi, group in enumerate(mf.metadata.bank_groups):
                self._yield_warmup_device_work(yield_budget)
                mk = (group.m_bits, group.k, group.params.layout)

                def load(pointer=mf.pointer, group=group) -> np.ndarray:
                    with self.data_store.open_file(pointer) as fh:
                        return read_bank_group(fh, group)

                try:
                    if self._device_backend is not None:
                        seg_key = self._device_backend.segment_key(mf.pointer, gi)
                        already = self._device_backend.is_resident(mk, seg_key)
                        if (
                            not bank_budget_hit
                            and not already
                            and (
                                bank_loaded_bytes + group.size
                                > self.config.bank_cache_bytes
                                or self._device_backend.total_bytes()
                                + group.size
                                > self.config.bank_cache_bytes
                            )
                        ):
                            bank_budget_hit = True
                            timeline["bank_budget_hit"] = True
                        if bank_budget_hit and mk in compile_reps:
                            continue  # sparse cold probes serve this group
                        self._device_backend._ensure_resident(
                            mf.pointer, mk, seg_key, load,
                            yield_to=self._pins_should_yield,
                        )
                        if not already:
                            bank_loaded_bytes += group.size
                        compile_reps.setdefault(mk, (mf.pointer, gi, load))
                    elif self._host_bank(mf.pointer, group) is None:
                        if (
                            not bank_budget_hit
                            and self._host_bank_bytes + group.size
                            > self.config.bank_cache_bytes
                        ):
                            bank_budget_hit = True
                            timeline["bank_budget_hit"] = True
                        if bank_budget_hit:
                            continue
                        self._host_bank_put(mf.pointer, group, load())
                except FileNotFoundError:
                    break  # merged/tombstoned during warmup
                except BackendReleasedError:
                    return  # engine stopped mid-warmup
                except Exception:
                    logger.exception("warmup: bank load failed for %r", mf.pointer)

        # Compile + transfer warm per superbank shape, covering BOTH probe
        # program ladders at every pow2 term pad a real query (or a <=16-way
        # coalesced burst) can produce — a missing pad is a fresh ~0.4 s jit
        # (seconds through a tunnel) on the first query of that shape:
        # - solo flat-AND reduce program at Tp = 1/2/4/8/16 (a plain 2-term
        #   AND query probes at Tp=2; bank.py splits >16-term requests into
        #   <=16-term chunks, so 16 is the ladder's top),
        # - CNF clause program at Tp = 1/2/4/8/16 with the Cp/Mp 16 floors
        #   (burst unions and OR-trees land here).
        # Fetching each result also pays any first-transfer handshake
        # before a user query does.
        if self._device_backend is not None and compile_reps:
            from .bloom.probe import compile_cnf_clauses

            # AOT pass first (same rationale as the scan pass: compiles off
            # the launch lock, cache-hits under it).
            try:
                n = self._device_backend.precompile_probe_programs(
                    yield_to=lambda: self._yield_warmup_device_work(yield_budget)
                )
                timeline["probe_aot_programs"] = n
                timeline["probe_aot_s"] = round(time.monotonic() - t0, 3)
            except Exception:
                logger.exception("warmup: probe AOT pass failed")
            warm_specs = [(n, "reduce") for n in (1, 2, 3, 5, 9)]  # Tp 1-16
            warm_specs += [(n, "clause") for n in (1, 2, 3, 5, 9)]  # Tp 1-16
            for mk, (pointer, gi, load) in compile_reps.items():
                for n, kind in warm_specs:
                    if self._stop_event.is_set():
                        return
                    self._yield_warmup_device_work(yield_budget)
                    builder = new_query()
                    for i in range(n):
                        builder = builder.token(f"\x00warm-{kind}-{n}-{i}\x00")
                    q = builder.build()
                    terms = compile_bloom_terms(q.bloom)
                    try:
                        if kind == "reduce":
                            self._device_backend.probe_groups(
                                [(pointer, gi, mk, load)], terms, reduce_and=True
                            )
                        else:
                            self._device_backend.probe_groups(
                                [(pointer, gi, mk, load)], terms,
                                reduce_and=False,
                                clause_mask=compile_cnf_clauses(
                                    q.bloom.expression, terms
                                ),
                            )
                    except Exception:
                        logger.exception("warmup: probe compile failed for %s", mk)
                        break

        timeline["probe_programs_s"] = round(time.monotonic() - t0, 3)
        # Lift the during-warmup probe gate: every probe program shape is
        # compiled, so queries go back to device probing while the pin pass
        # continues. The gated window's host bank copies are now redundant
        # (device superbanks serve every probe) — release the memory.
        self._warmup_probe_ready.set()
        if self._device_backend is not None:
            with self._host_bank_lock:
                self._host_bank_cache.clear()
                self._host_bank_bytes = 0

        # Pre-spawn the block pool's worker threads (ThreadPoolExecutor
        # creates them lazily; measured ~50 ms of thread startup landing on
        # the first query at refscale otherwise). The rendezvous needs every
        # worker simultaneously idle, so it must ABORT the moment a query
        # holds (or arrives wanting) a worker — a plain full-pool barrier
        # parked every idle worker for its whole 5 s timeout whenever one
        # worker was busy with a during-warmup query, starving that query's
        # remaining block tasks for seconds.
        try:
            if not self._pins_should_yield():
                spin = threading.Barrier(self._block_pool._max_workers, timeout=5)
                futs = [
                    self._block_pool.submit(spin.wait)
                    for _ in range(self._block_pool._max_workers)
                ]
                deadline = time.monotonic() + 5
                while not all(f.done() for f in futs):
                    if time.monotonic() > deadline or self._pins_should_yield():
                        spin.abort()  # releases all waiters immediately
                        break
                    time.sleep(0.005)
        except Exception:
            pass  # best-effort; threads spawn on first use regardless

        # Serving mode: wait for the concurrent scan-program pass (started
        # before the bank loads — the reserve above fixed the matrix shape,
        # so those are the programs every query will run).
        if self._row_cache is not None:
            if scan_thread is not None:
                scan_thread.join()
            timeline.setdefault(
                "scan_programs_s", round(time.monotonic() - t0, 3)
            )
            # Time-to-first-warm-query: from here on a query runs compiled
            # programs end to end (its own blocks pin on demand if the
            # background pass hasn't reached them yet).
            timeline["warm_ready_s"] = round(time.monotonic() - t0, 3)
            if pin_thread is not None:
                pin_thread.join()
            timeline["pins_s"] = round(time.monotonic() - t0, 3)
        timeline["total_s"] = round(time.monotonic() - t0, 3)
        # Start serving with EMPTY churn buckets: tokens accrued over a
        # multi-minute warmup would otherwise fund an immediate burst of
        # at-capacity refills (pure thrash whose uploads queue ahead of the
        # first queries' fetches) — the caches are exactly as warm as they
        # can get at this instant.
        self._pin_churn.drain()
        self._bank_churn.drain()

    def _warmup_pin_rows(self, maybe_files, limit: Optional[int] = None) -> list:
        """Pre-pin rows up to the serving cache budget (warmup pin pass;
        runs on its own thread concurrent with the bank/probe warms).
        ``limit`` bounds the number of blocks pinned (the synchronous
        phase-1 pass that feeds the scan compiles)."""
        from .rowcache import STREAM_STRIDE

        pins: list = []
        budget = self.config.row_cache_bytes
        # Host-side yield budget for the background pass: block decode +
        # pack burn the CPU the query path's host scans need (decisive on
        # few-core hosts — a query host-scanning cold blocks mid-warmup ran
        # 2-10x slower while the pin pass decoded on the same core).
        host_yield = _YieldBudget(burst=30.0)
        for mf in maybe_files:
            for blk in mf.metadata.data_blocks:
                if self._stop_event.is_set():
                    return pins
                if limit is not None and len(pins) >= limit:
                    return pins
                if limit is None:
                    self._yield_warmup_device_work(host_yield)
                if self._row_cache.total_bytes() >= budget:
                    break
                free = self._row_cache.stream_free_chunks()
                if free is not None:
                    blk_chunks = -(-max(blk.uncompressed_size, 1) // STREAM_STRIDE)
                    if free < blk_chunks + 512:
                        # Stream reservation full: stop pre-pinning; queries
                        # pin what they touch (evict-in-place keeps shape).
                        return pins
                key = (mf.pointer, blk.offset)
                entry = self._row_cache.get(key)
                if entry is None:
                    try:
                        # The long (limit=None, background-thread) pass
                        # yields to in-flight queries; the tiny synchronous
                        # phase-1 pass that feeds the scan compiles does not.
                        entry = self._decode_and_pin(
                            mf.pointer, blk,
                            yield_to=None if limit is not None
                            else self._pins_should_yield,
                        )
                    except FileNotFoundError:
                        break
                    except Exception:
                        logger.exception("warmup: row pin failed for %r", mf.pointer)
                        continue
                if entry is not None:
                    pins.append(entry)
        return pins

    def _decode_and_pin(self, pointer: bytes, blk, yield_to=None):
        """Decode one block (CRC-verified) and pin its rows in the device
        row cache — the warmup counterpart of the query path's decode+pin.

        With a serving sidecar (config.serving_cache_dir) a previously
        packed block skips the read+decode+pack entirely: the pin streams
        straight from the sidecar's mmap to the device (restart fast
        path)."""
        from . import native as _native
        from .scan import split_rows_arrays

        key = (pointer, blk.offset)
        sc = self._serving_cache
        if sc is not None and not self._row_shadow:
            hit = sc.load(pointer, blk)
            if hit is not None:
                return self._row_cache.pin(
                    key, None, hit.row_offsets, hit.row_lengths,
                    fetcher=self._make_row_fetcher(
                        pointer, blk, comp_index=hit.comp_index
                    ),
                    yield_to=yield_to,
                    prepacked=(hit.chunks, hit.always_candidate, hit.n_chunks),
                )
        with self.data_store.open_file(pointer) as fh:
            compressed = read_block_rows_compressed(fh, blk, verify=False)
        processed = (
            _native.process_block(
                compressed, blk.compression, blk.row_data_hash,
                blk.uncompressed_size, [],
            )
            if _native.available()
            else None
        )
        if processed is not None:
            data_arr, offsets, lengths, _ = processed
            data = data_arr.tobytes()
        else:
            from .checksum import crc32c as _crc32c
            from .file_format import InvalidHashError

            if _crc32c(compressed) != blk.row_data_hash:
                raise InvalidHashError("row data CRC mismatch")
            data = decompress_block(compressed, blk.compression, blk.uncompressed_size)
            _, offsets, lengths = split_rows_arrays(data)
        comp_index = self._comp_index_for(blk, compressed)
        prepacked = self._sidecar_pack_store(
            pointer, blk, data, offsets, lengths, comp_index
        )
        return self._row_cache.pin(
            key, data, offsets, lengths,
            fetcher=self._make_row_fetcher(pointer, blk, comp_index=comp_index),
            yield_to=yield_to,
            prepacked=prepacked,
        )

    def _sidecar_pack_store(
        self, pointer: bytes, blk, data, offsets, lengths, comp_index
    ):
        """Pack a block for pinning and persist the result to the serving
        sidecar (best-effort). Returns the prepacked triple for pin(), or
        None when no sidecar is configured (pin packs internally)."""
        sc = self._serving_cache
        if sc is None:
            return None
        from .rowcache import pack_block

        try:
            chunks, flags, n_chunks = pack_block(data, offsets, lengths)
        except Exception:
            logger.exception("sidecar pack failed for %r", pointer)
            return None
        try:
            sc.store(pointer, blk, chunks, flags, n_chunks, offsets, lengths, comp_index)
        except Exception:
            logger.exception("sidecar store failed for %r", pointer)
        return chunks, flags, n_chunks

    def _warmup_scan_programs(
        self, pinned: list, yield_budget: "_YieldBudget", timeline: dict, t0: float
    ) -> None:
        """Compile every serving-mode scan program shape (warm thread).

        One dense scan per word bucket: each (matrix shape, word bucket)
        pair is its own jit program, and an uncompiled bucket would
        otherwise land its multi-second compile on the first user query
        with a needle of that length. Then the dense n_real buckets 2/4/8
        (coalesced concurrent bursts launch multi-needle unions; each pow2
        needle-count bucket is its own compile), then the SPARSE segment
        shapes (pow2 segment-count buckets 1 and 4 — needle queries
        typically touch 1-3 blocks; at reference scale the slice program
        cost the first needle query ~1.2 s uncompiled). Needles must be
        DISTINCT per launch: the needle-bitmap cache would skip a repeat's
        launch, leaving its program uncompiled.
        """
        from .bloom.pallas_kernels import SCAN_WORD_BUCKETS

        try:
            # AOT pass FIRST (no launch lock, no pending queue): populates
            # the compilation caches so the locked warm executions below —
            # and any query launch racing them — deserialize in ~0.1-0.5 s
            # instead of compiling for seconds while holding the lock.
            try:
                n = self._row_cache.precompile_scan_programs(
                    pinned,
                    yield_to=lambda: self._yield_warmup_device_work(yield_budget),
                )
                timeline["scan_aot_programs"] = n
                timeline["scan_aot_s"] = round(time.monotonic() - t0, 3)
            except Exception:
                logger.exception("warmup: scan AOT pass failed")
            for wb in SCAN_WORD_BUCKETS:
                if self._stop_event.is_set():
                    return
                ln = min(4 * wb - 3, 32)  # longest length in this bucket
                needle = (b"\x00warm" + b"\x00" * ln)[:ln]
                try:
                    # Yield BETWEEN every warm launch, not once per word
                    # bucket: each launch below is a fresh multi-second jit
                    # holding the scan launch lock, and on a 1-core host the
                    # back-to-back inner launches re-acquired the lock
                    # before a queued query thread ever got scheduled — the
                    # captured 72.8 s during-warmup stall (BENCH_r04) was a
                    # query starving behind a full bucket of compiles.
                    self._yield_warmup_device_work(yield_budget)
                    self._row_cache.scan_many(pinned, [needle])
                    for nr in (2, 4, 8):
                        group = [
                            (b"\x02w%d_%d" % (nr, i) + b"\x00" * ln)[:ln]
                            for i in range(nr)
                        ]
                        self._yield_warmup_device_work(yield_budget)
                        self._row_cache.scan_many(pinned, group)
                    for si, subset in enumerate(
                        (pinned[:1], pinned[:2], pinned[:3])
                    ):
                        if subset and len(pinned) > len(subset):
                            sub = (b"\x01wrm%d" % si + b"\x00" * ln)[:ln]
                            self._yield_warmup_device_work(yield_budget)
                            self._row_cache.scan_many(subset, [sub])
                except Exception:
                    logger.exception("warmup: scan compile failed")
                    break
        finally:
            timeline["scan_programs_s"] = round(time.monotonic() - t0, 3)
            # Lift the during-warmup scan gate: from here every scan shape
            # a query can launch is compiled, so prescans go back on-device
            # while the pin pass continues.
            self._warmup_scan_ready.set()

    def _yield_warmup_device_work(self, budget: "_YieldBudget") -> None:
        """Pause a warmup device-work loop while queries are in flight.

        Warmup's bank uploads and probe compile executions share the single
        device stream with query launches; without this gate a query
        arriving mid-warmup waited 10-40 s behind them. ``budget`` is a
        total-seconds allowance shared across the whole warmup (INCLUDING
        the concurrent scan-compile thread — consumption is locked so two
        threads can't both spend the same tail) so a saturating query
        stream can only stretch warmup by a bounded amount."""
        while self._active_query_ids and not self._stop_event.is_set():
            if not budget.consume(0.005):
                return
            time.sleep(0.005)

    def _pins_should_yield(self) -> bool:
        """Gate for background/warmup pin device work: truthy while queries
        are in flight, so pin uploads and stream compactions never queue
        ahead of a query's probe/scan launches on the device stream (the
        xlscale erratic-latency fix — a 3-19 s p99 at partial residency came
        from scans waiting behind multi-GB pin/compaction device work)."""
        return bool(self._active_query_ids) and not self._stop_event.is_set()

    def _bg_churn_admit(self, nbytes: int) -> bool:
        """Admission control for background pins once the stream is full.

        At capacity a background pin lands only by EVICTING warm blocks.
        When the working set exceeds the cache (every query touches cold
        blocks) that is pure thrash: the hit rate doesn't improve, each
        evicting pin triggers upload + compaction device work, and on
        tunneled TPUs the uploads add queuing delay to query result
        fetches. Evicting pins are therefore rate-limited to ~5% of
        capacity per minute — a genuinely shifted hot set still migrates
        in within minutes, while scan-shaped workloads stop churning.
        Free-space pins (stream below reservation) are never limited.
        """
        rc = self._row_cache
        free = rc.stream_free_chunks()
        if free is None:
            return True  # no reservation: pin() grows instead of evicting
        from .rowcache import STREAM_STRIDE

        need = -(-max(nbytes, 1) // STREAM_STRIDE) + 512
        if free >= need:
            return True
        return self._pin_churn.admit(nbytes)

    def _admit_background_pin(self, key, nbytes: int) -> bool:
        """Dedup + cap + churn admission for a background pin.

        Runs BEFORE the caller prepares the pin payload (a multi-MB bytes
        copy + row fetcher): in the beyond-HBM steady state most refills
        are denied, and a denied pin must cost the query's critical path
        nothing. On True the key is registered in _bg_pins — the caller
        MUST reach _submit_background_pin(key, ...) or discard the key
        itself (payload prep failing in between would otherwise leak the
        registration and permanently block pins for this key)."""
        with self._bg_pin_lock:
            if key in self._bg_pins or len(self._bg_pins) >= 8:
                return False  # dropped = stays a miss; a later query retries
            self._bg_pins.add(key)
        # Admission AFTER dedup so duplicate submissions of one in-flight
        # block can't drain the churn budget.
        if not self._bg_churn_admit(nbytes):
            with self._bg_pin_lock:
                self._bg_pins.discard(key)
            return False  # stream full and churn budget spent: stays a host hit
        return True

    def _submit_background_pin(
        self, key, data, offsets, lengths, fetcher, sidecar=None
    ) -> None:
        """Queue a pre-admitted cache-warm pin; bounded, best-effort.

        The caller holds ``key``'s _bg_pins registration from
        _admit_background_pin; every exit below (pin done, pin failed,
        pool shut down) releases it. ``sidecar`` = (pointer, blk,
        comp_index) to persist the packed state on the pin thread."""

        def work():
            try:
                if not self._stop_event.is_set():
                    prepacked = None
                    if sidecar is not None:
                        pointer, blk, comp_index = sidecar
                        prepacked = self._sidecar_pack_store(
                            pointer, blk, data, offsets, lengths, comp_index
                        )
                    self._row_cache.pin(
                        key, data, offsets, lengths, fetcher=fetcher,
                        yield_to=self._pins_should_yield,
                        prepacked=prepacked,
                    )
            except Exception:
                logger.exception("background pin failed for %r", key)
            finally:
                with self._bg_pin_lock:
                    self._bg_pins.discard(key)

        try:
            self._pin_pool.submit(work)
        except RuntimeError:  # pool shut down during stop()
            with self._bg_pin_lock:
                self._bg_pins.discard(key)

    def drain_background_pins(self, timeout: Optional[float] = None) -> None:
        """Wait until every queued background pin has landed (tests and
        benchmarks that assert cache state after a query)."""
        self._pin_pool.submit(lambda: None).result(timeout)

    def _comp_index_for(self, blk, compressed):
        """Snappy random-access chunk index for a block's compressed bytes
        (None for other codecs) — feeds both the shadow-free fetcher and
        the serving sidecar."""
        if blk.compression == "snappy" and compressed is not None:
            from . import snappy as _snappy

            return _snappy.chunk_index(compressed)
        return None

    def _make_row_fetcher(self, pointer: bytes, blk, compressed=None, *,
                          comp_index=None):
        """Shadow-free extraction source for a pinned block, or None when the
        host shadow is enabled. Captures only tiny state (block metadata and,
        for snappy, the ~nchunks-entry compressed chunk index — passed in,
        or derived from ``compressed``)."""
        if self._row_shadow:
            return None
        if comp_index is None:
            comp_index = self._comp_index_for(blk, compressed)

        def fetch(idx, offsets, lengths):
            return self._fetch_pinned_rows(pointer, blk, comp_index, idx, offsets, lengths)

        return fetch

    def _fetch_pinned_rows(self, pointer, blk, comp_index, idx, offsets, lengths):
        """Ranged re-read of specific pinned rows from the data store.

        Returns ``(buffer, local_offsets, local_lengths)``. The block's CRC
        was verified when it was pinned and files are immutable (tombstone
        grace keeps replaced files readable until in-flight queries drain),
        so the re-read trusts the store; snappy chunks still self-validate
        in the native decoder. Codecs:
        - none: row byte spans pread directly (coalesced into runs);
        - snappy: only the 64 KiB chunks overlapping candidate rows decode
          (chunk_index random access);
        - zstd (single frame): whole-block decode on demand.
        """
        out_len = np.asarray(lengths, dtype=np.int64)[idx]
        n = len(out_len)
        out_off = np.zeros(n, dtype=np.int64)
        if n == 0:
            return b"", out_off, out_len
        row_off = np.asarray(offsets, dtype=np.int64)[idx]
        parts: list[bytes] = []
        pos = 0
        with self.data_store.open_file(pointer) as fh:
            if blk.compression == "snappy" and comp_index is not None:
                from .snappy import CHUNK_SIZE as _SNAP_CHUNK
                from .snappy import decompress_chunk_run

                c0 = row_off // _SNAP_CHUNK
                c1 = (row_off + out_len - 1) // _SNAP_CHUNK + 1
                rs, re_ = int(c0[0]), int(c1[0])
                runs: list[tuple[int, int, list[int]]] = []
                rows: list[int] = [0]
                for j in range(1, n):
                    if int(c0[j]) <= re_:
                        re_ = max(re_, int(c1[j]))
                        rows.append(j)
                    else:
                        runs.append((rs, re_, rows))
                        rs, re_, rows = int(c0[j]), int(c1[j]), [j]
                runs.append((rs, re_, rows))
                for rs, re_, rows in runs:
                    fh.seek(blk.offset + int(comp_index[rs]))
                    comp = fh.read(int(comp_index[re_] - comp_index[rs]))
                    buf = decompress_chunk_run(comp)
                    base = rs * _SNAP_CHUNK
                    for j in rows:
                        out_off[j] = pos + int(row_off[j]) - base
                    parts.append(buf)
                    pos += len(buf)
            elif blk.compression == "none":
                ends = row_off + out_len
                rs, re_ = int(row_off[0]), int(ends[0])
                runs2: list[tuple[int, int, list[int]]] = []
                rows = [0]
                for j in range(1, n):
                    if int(row_off[j]) - re_ <= 4096:
                        re_ = max(re_, int(ends[j]))
                        rows.append(j)
                    else:
                        runs2.append((rs, re_, rows))
                        rs, re_, rows = int(row_off[j]), int(ends[j]), [j]
                runs2.append((rs, re_, rows))
                for rs, re_, rows in runs2:
                    fh.seek(blk.offset + rs)
                    buf = fh.read(re_ - rs)
                    for j in rows:
                        out_off[j] = pos + int(row_off[j]) - rs
                    parts.append(buf)
                    pos += len(buf)
            else:
                payload = read_block_rows_compressed(fh, blk, verify=False)
                data = decompress_block(
                    payload, blk.compression, blk.uncompressed_size
                )
                return data, row_off, out_len
        return b"".join(parts), out_off, out_len

    def stop(self, timeout: Optional[float] = None) -> None:
        """Graceful shutdown: buffered rows are flushed to a complete file

        before return (reference guarantee, bloom_tree_engine_test.go:
        2313-2395). Raises TimeoutError if workers don't finish in time.
        """
        if not self._started:
            return
        deadline = None if timeout is None else time.monotonic() + timeout
        self._stop_event.set()
        # Unblock the ingest worker promptly.
        try:
            self._ingest_queue.put_nowait(_STOP)
        except queue.Full:
            pass
        threads = [self._ingest_thread, self._flush_thread]
        if self._merge_thread is not None:
            threads.append(self._merge_thread)
        for thread in threads:
            remaining = None if deadline is None else max(0.0, deadline - time.monotonic())
            thread.join(remaining)
            if thread.is_alive():
                raise TimeoutError("shutdown timeout exceeded")
        # Wait for in-flight queries to drain BEFORE applying deferred
        # tombstones — at tombstone_grace_seconds=0 a force-apply would
        # unlink a file a query worker is still reading.
        with self._queries_drained:
            while self._active_query_ids:
                remaining = None if deadline is None else deadline - time.monotonic()
                if remaining is not None and remaining <= 0:
                    raise TimeoutError(
                        "shutdown timeout exceeded waiting for in-flight queries"
                    )
                self._queries_drained.wait(remaining)
            drain = [pointer for pointer, _ in self._deferred_tombstones]
            self._deferred_tombstones = []
        for pointer in drain:
            self._tombstone_everywhere(pointer)
        # Release worker threads: start-after-stop is forbidden, so the pools
        # can never be needed again; without this, processes that construct
        # many engines accumulate idle non-daemon threads.
        self._block_pool.shutdown(wait=False)
        self._pin_pool.shutdown(wait=False)
        self._warm_pool.shutdown(wait=False)
        self._sparse_probe_pool.shutdown(wait=False)
        with self._bank_mmap_lock:
            self._bank_mmaps.clear()  # refcounting closes the maps
        self._started = False
        # Return HBM to the process NOW: jax Arrays free device memory only
        # when the last Python reference dies, and engine/thread/closure
        # cycles routinely outlive stop() (observed: the next engine in the
        # same process OOM-ing its warmup pins while this one's stream was
        # still resident). Queries are drained above; lingering background
        # pins fail fast on the released cache and are swallowed by the
        # warmup error handling.
        if self._row_cache is not None:
            self._row_cache.release()
        if self._device_backend is not None:
            self._device_backend.release()

    # ------------------------------------------------------------------
    # Ingest API (reference IngestRows/Flush :310-346)
    # ------------------------------------------------------------------

    def ingest_rows(
        self, rows: list[dict], done: Optional[Future] = None, timeout: Optional[float] = None
    ) -> None:
        """Queue rows for the ingest actor. ``done`` (a Future) resolves once

        the rows are durably flushed (the reference's per-ingest doneChan).
        """
        if self._stop_event.is_set() or not self._started:
            raise RuntimeError("engine is not running")
        self._ingest_queue.put(_IngestRequest(rows, done), timeout=timeout)

    def ingest_serialized(
        self,
        rows: list[bytes],
        done: Optional[Future] = None,
        timeout: Optional[float] = None,
        partition_id: Optional[str] = None,
    ) -> None:
        """Fast lane for pre-serialized rows (e.g. JSON-lines log pipelines).

        Each element is one compact-JSON object's bytes; they are stored
        verbatim and tokenized entirely by the native path (no Python dict
        round-trip). ``min_max_indexes`` are supported: values extract at
        byte level (native bs_extract_minmax; rows it can't reproduce
        bit-exactly parse via the Python spec). ``partition_id`` routes the
        whole batch to one partition explicitly; when ``partition_func`` is
        configured it stays authoritative for ``ingest_rows``, so the fast
        lane then *requires* an explicit ``partition_id`` (the caller
        asserts the batch's partition — evaluating an arbitrary Python
        callable would force the dict round-trip this lane exists to skip).
        """
        if self.config.partition_func is not None and partition_id is None:
            raise InvalidConfigError(
                "ingest_serialized with partition_func configured requires an "
                "explicit partition_id (the fast lane cannot evaluate a "
                "Python PartitionFunc without parsing rows)"
            )
        if self._stop_event.is_set() or not self._started:
            raise RuntimeError("engine is not running")
        self._ingest_queue.put(
            _IngestRequest(rows, done, serialized=True, partition_id=partition_id or ""),
            timeout=timeout,
        )

    def flush(self, timeout: Optional[float] = None) -> None:
        """Force-flush buffered data and wait for durability (:326-346)."""
        if self._stop_event.is_set() or not self._started:
            raise RuntimeError("engine is not running")
        done: Future = Future()
        self._ingest_queue.put(_IngestRequest(None, done, force_flush=True), timeout=timeout)
        done.result(timeout=timeout)

    # ------------------------------------------------------------------
    # Ingest actor (reference ingestWorker :348-414)
    # ------------------------------------------------------------------

    def _ingest_worker(self) -> None:
        state = _IngestState(self)
        try:
            while True:
                try:
                    # The 100ms poll doubles as the time-based flush ticker
                    # (reference :363, :398-412).
                    req = self._ingest_queue.get(timeout=0.1)
                except queue.Empty:
                    req = None
                if req is _STOP or (req is None and self._stop_event.is_set()):
                    # Drain anything still queued, then final-flush.
                    while True:
                        try:
                            pending = self._ingest_queue.get_nowait()
                        except queue.Empty:
                            break
                        if pending is not _STOP:
                            state.process(pending)
                    if state.buffered_row_count > 0 or state.done_futures:
                        state.flush_buffered()
                    return
                if req is not None:
                    state.process(req)
                state.maybe_time_flush()
        finally:
            self._ingest_done.set()

    # ------------------------------------------------------------------
    # Flush worker (reference flushWorker :694-724, handleFlush :726-821)
    # ------------------------------------------------------------------

    def _flush_worker(self) -> None:
        while True:
            try:
                flush_req = self._flush_queue.get(timeout=0.05)
            except queue.Empty:
                if self._ingest_done.is_set():
                    # Ingest finished; drain any remaining flushes and exit.
                    while True:
                        try:
                            flush_req = self._flush_queue.get_nowait()
                        except queue.Empty:
                            return
                        self._handle_flush(flush_req)
                continue
            self._handle_flush(flush_req)

    def _trigger_flush(self, flush_req: _FlushRequest) -> None:
        """Queue for the flush worker; handle inline if it's busy (:677-692)."""
        try:
            self._flush_queue.put_nowait(flush_req)
        except queue.Full:
            self._handle_flush(flush_req)

    def _handle_flush(self, flush_req: _FlushRequest) -> None:
        if not flush_req.partition_buffers:
            # Durability barrier (empty force-flush): earlier queued flushes
            # have already been handled because the queue is FIFO.
            _resolve(flush_req.done_futures, None)
            return
        try:
            writer_fh, file_pointer = self.data_store.create_file()
        except Exception as exc:
            _resolve(flush_req.done_futures, exc)
            return
        try:
            writer = DataFileWriter(writer_fh, self.config.file_bloom_params)
            for buf in flush_req.partition_buffers.values():
                self._warn_if_saturated(buf)
                compressed = buf.encoder.finish()
                writer.add_block(
                    compressed,
                    buf.filters,
                    rows=buf.row_count,
                    partition_id=buf.partition_id,
                    min_max_indexes=buf.min_max_indexes,
                    compression=self.config.row_data_compression,
                    uncompressed_size=buf.uncompressed_size,
                    created_at_ms=buf.created_at_ms,
                    # Stamp the params this buffer's filters were actually
                    # built with (reference stamps current config :792-793;
                    # ours can vary per buffer under auto sizing).
                    params=buf.params,
                    rows_canonical=buf.rows_canonical,
                )
            self._warn_if_file_filters_saturated(flush_req.file_filters)
            metadata = writer.finish(flush_req.file_filters)
            writer_fh.close()
        except Exception as exc:
            # Never publish a partial file: abort (close + delete temp) when
            # the handle supports it, and tombstone the pointer either way.
            try:
                if hasattr(writer_fh, "abort"):
                    writer_fh.abort()
                else:
                    writer_fh.close()
            except Exception:
                pass
            try:
                self.data_store.tombstone_file(file_pointer)
            except Exception:
                pass
            _resolve(flush_req.done_futures, exc)
            return

        try:
            self.meta_store.update(
                [WriteOperation(metadata, file_pointer, file_size=writer.bytes_written)], []
            )
        except Exception as exc:
            _resolve(flush_req.done_futures, exc)
            return

        self._on_file_written(file_pointer, metadata, writer.bank_arrays)
        _resolve(flush_req.done_futures, None)

    def _warn_if_saturated(self, buf: "_PartitionBuffer") -> None:
        """Surface saturating block-filter sizing at flush time.

        Reference-parity sizing counts ROWS, but each row inserts many
        distinct keys, so high-cardinality data silently saturates block
        filters and queries degrade to full scans (the reference's own
        benchmark suffers this; docs/PERFORMANCE.md "Known bottlenecks").
        One warning per engine, pointing at block_bloom_expected_items.
        """
        if self._saturation_warned:
            return
        p = self.config.bloom_false_positive_rate
        for name in ("field", "token", "field_token"):
            flt = getattr(buf.filters, name)
            try:
                ones = int(np.bitwise_count(flt.words).sum(dtype=np.int64))
            except AttributeError:  # numpy < 2: popcount via unpackbits
                ones = int(np.unpackbits(flt.words.view(np.uint8)).sum())
            fill = ones / max(flt.m_bits, 1)
            est_fpr = fill ** flt.k
            if est_fpr > max(10 * p, 1e-6):
                self._saturation_warned = True
                logger.warning(
                    "block %s filter saturating: fill %.0f%% -> est. FPR %.2g "
                    "(configured %.2g). Filters are sized by max_row_group_rows "
                    "(%d) but each row inserts several distinct keys; set "
                    "block_bloom_expected_items to the expected distinct keys "
                    "per block to keep the FPR honest.",
                    name, 100 * fill, est_fpr, p, self.config.max_row_group_rows,
                )
                return

    def _warn_if_file_filters_saturated(self, filters: BloomFilters) -> None:
        """Surface saturating FILE-level filter sizing at flush time.

        A saturated file filter silently defeats file pruning: every query
        then probes every file's block banks (at 33 GB / 454 files this
        was measured as ~2-7 s of sparse seek-reads on the first cold
        query and most of warm p50 — the file filter passed 344/454 files
        for a needle present in 3). One warning per engine, pointing at
        file_bloom_expected_items. The reference sizes file filters the
        same way and degrades identically; the warning is the divergence.
        """
        if self._file_saturation_warned:
            return
        p = self.config.bloom_false_positive_rate
        for name in ("field", "token", "field_token"):
            flt = getattr(filters, name)
            try:
                ones = int(np.bitwise_count(flt.words).sum(dtype=np.int64))
            except AttributeError:  # numpy < 2: popcount via unpackbits
                ones = int(np.unpackbits(flt.words.view(np.uint8)).sum())
            fill = ones / max(flt.m_bits, 1)
            est_fpr = fill ** flt.k
            if est_fpr > max(10 * p, 1e-6):
                self._file_saturation_warned = True
                logger.warning(
                    "file-level %s filter saturating: fill %.0f%% -> est. "
                    "FPR %.2g (configured %.2g). File filters are sized by "
                    "file_bloom_expected_items (%d) but this file "
                    "accumulated far more distinct keys; raise it to keep "
                    "file pruning effective (a saturated file filter makes "
                    "every query probe every file's block banks).",
                    name, 100 * fill, est_fpr, p,
                    self.config.file_bloom_expected_items,
                )
                return

    def _on_file_written(
        self, file_pointer: bytes, metadata: FileMetadata, bank_arrays=None
    ) -> None:
        """New immutable file published: warm the device bank cache with the

        banks still in memory (first queries then never touch disk for
        filters)."""
        if self._device_backend is None:
            return
        self._device_backend.invalidate(file_pointer)
        if not bank_arrays:
            return
        try:
            for group_idx, (group, bank) in enumerate(
                zip(metadata.bank_groups, bank_arrays)
            ):
                seg_key = self._device_backend.segment_key(file_pointer, group_idx)
                self._device_backend._ensure_resident(
                    file_pointer,
                    (group.m_bits, group.k, group.params.layout),
                    seg_key,
                    lambda bank=bank: bank,
                    yield_to=self._pins_should_yield,
                )
        except BackendReleasedError:
            pass  # raced engine stop; nothing left to warm
        except Exception:
            logger.exception("bank warm-on-flush failed (queries will reload)")

    # ------------------------------------------------------------------
    # Observability
    # ------------------------------------------------------------------

    def stats(self) -> dict:
        """Point-in-time observability snapshot (cheap; safe under load).

        The reference's only signals are the lossy per-block stats stream
        and MergeStats; production deployments also need resource-level
        introspection: cache residency, device launch counts, and batching
        effectiveness.
        """
        out: dict = {
            "active_queries": len(self._active_query_ids),
            "deferred_tombstones": len(self._deferred_tombstones),
            "host_bank_cache_bytes": self._host_bank_bytes,
            "host_bank_cache_entries": len(self._host_bank_cache),
            "file_bank_groups": len(self._file_bank_cache),
            "background_warms_in_flight": len(self._warming),
            "background_pins_churn_skipped": self._pin_churn.skipped,
            "bank_warms_churn_skipped": self._bank_churn.skipped,
        }
        if self._device_backend is not None:
            out["device"] = self._device_backend.stats()
        if self._row_cache is not None:
            out["row_cache"] = self._row_cache.stats()
        if self._serving_cache is not None:
            out["serving_cache"] = self._serving_cache.stats()
        out["last_query_timings"] = list(self._query_timings)
        if self._warmup_timeline:
            out["warmup"] = dict(self._warmup_timeline)
        return out

    def profile_trace(self, log_dir: str):
        """Context manager capturing a jax.profiler trace of device work.

        Wrap query calls to capture probe-kernel and row-scan timelines
        (view with TensorBoard / xprof). The reference has no profiling
        hooks (SURVEY.md §5); per-block stats remain the lossy stream.
        """
        import jax

        return jax.profiler.trace(log_dir)

    # ------------------------------------------------------------------
    # Merge / compaction (reference Merge :1206-1372)
    # ------------------------------------------------------------------

    def _merge_loop(self) -> None:
        interval = self.config.merge_interval_seconds
        while not self._stop_event.wait(interval):
            try:
                self.merge()
            except Exception:
                logger.exception("background merge failed")

    def merge(self) -> MergeStats:
        """Merge small files (and drop TTL-expired blocks); safe to run in

        the background alongside ingest and queries — files are immutable and
        replacement publishes atomically through the MetaStore. When the
        MetaStore provides merge leases (coordination.py, the reference's
        README-only CoordinatedMetaStore design), concurrent mergers against
        shared storage serialize; a held lease makes this call a no-op.
        """
        acquire = getattr(self.meta_store, "acquire_merge_lease", None)
        if acquire is None:
            return _Merger(self).merge()
        lease = acquire()
        if lease is None:
            logger.info("merge lease held elsewhere; skipping")
            return MergeStats()
        with lease:
            # The lease is a PUBLISH guard, not just an entry gate: a merge
            # outrunning the TTL may be legitimately stolen mid-run, and
            # publishing afterwards would make two mergers' outputs (same
            # source rows) visible — permanent duplicates. _Merger renews
            # before each group's publish and aborts when the lease is lost.
            return _Merger(self, lease=lease).merge()

    # ------------------------------------------------------------------
    # Query execution (reference Query :934-1204)
    # ------------------------------------------------------------------

    def query(
        self,
        q: Optional[Query],
        result_queue: queue.Queue,
        error_queue: Optional[queue.Queue] = None,
        stats_queue: Optional[queue.Queue] = None,
        cancel_event: Optional[threading.Event] = None,
        file_pointers: Optional[set] = None,
    ) -> None:
        """Execute asynchronously; rows stream to ``result_queue`` (unordered),

        then a ``None`` sentinel signals completion. Per-worker errors go to
        ``error_queue`` (that worker stops; others continue). Invalid regex
        raises here, synchronously (fail-fast, reference :944).

        ``file_pointers`` restricts the scan to those files — the
        shared-storage scatter/gather seam (a coordinator assigns each peer
        a disjoint file subset; parallel/discovery.py).
        """
        if q is None:
            q = new_query().build()
        compiled_regex = compile_regex_query(q.regex)
        thread = threading.Thread(
            target=self._run_query,
            args=(
                q, compiled_regex, result_queue, error_queue, stats_queue,
                cancel_event, file_pointers,
            ),
            name="bloomsearch-query",
            daemon=True,
        )
        thread.start()

    def query_iter(self, q: Optional[Query], timeout: Optional[float] = None):
        """Generator over streaming results (raises the first worker error
        at the end if any occurred)."""
        result_queue: queue.Queue = queue.Queue()
        error_queue: queue.Queue = queue.Queue()
        self.query(q, result_queue, error_queue)
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            remaining = None if deadline is None else max(0.0, deadline - time.monotonic())
            row = result_queue.get(timeout=remaining)
            if row is None:
                break
            yield row
        try:
            raise error_queue.get_nowait()
        except queue.Empty:
            pass

    def query_sync(
        self, q: Optional[Query], timeout: Optional[float] = None
    ) -> list[dict]:
        """Convenience: run a query and collect all results; raises on error."""
        from .utils import collect_query_sync

        return collect_query_sync(self.query, q, timeout)

    def _run_query(
        self,
        q: Query,
        compiled_regex,
        result_queue: queue.Queue,
        error_queue: Optional[queue.Queue],
        stats_queue: Optional[queue.Queue],
        cancel_event: Optional[threading.Event],
        file_pointers: Optional[set] = None,
    ) -> None:
        with self._query_track_lock:
            query_id = self._next_query_id
            self._next_query_id += 1
            self._active_query_ids.add(query_id)
        try:
            self._run_query_inner(
                q, compiled_regex, result_queue, error_queue, stats_queue,
                cancel_event, file_pointers,
            )
        except BaseException as exc:
            # The inner runner posts the completion sentinel on every normal
            # path, but an exception OUTSIDE its planning guard (pool
            # shutdown racing stop(), a released row cache, ...) must not
            # leave callers blocked on result_queue.get() forever: surface
            # the error and complete the stream. A duplicate sentinel is
            # impossible — the inner function's posts all return afterwards.
            try_put(error_queue, exc)
            result_queue.put(None)
        finally:
            # Claim ripe tombstones FIRST, apply them, and only then mark
            # this query drained — so stop() (which waits on active ids
            # before its own drain) never returns while physical
            # tombstoning is still in flight.
            drain: list[bytes] = []
            with self._query_track_lock:
                remaining: list[tuple[bytes, set[int]]] = []
                for pointer, waiting_on in self._deferred_tombstones:
                    waiting_on.discard(query_id)
                    if waiting_on:
                        remaining.append((pointer, waiting_on))
                    else:
                        drain.append(pointer)
                self._deferred_tombstones = remaining
            for pointer in drain:
                self._tombstone_everywhere(pointer)
            with self._queries_drained:
                self._active_query_ids.discard(query_id)
                self._queries_drained.notify_all()

    def _tombstone_everywhere(self, pointer: bytes) -> None:
        try:
            self.data_store.tombstone_file(pointer)
        except Exception:
            logger.exception("tombstone failed for %r", pointer)
        if self._device_backend is not None:
            self._device_backend.invalidate(pointer)
        if self._row_cache is not None:
            self._row_cache.invalidate_file(pointer)
        if self._serving_cache is not None:
            self._serving_cache.invalidate_file(pointer)
        self._invalidate_host_bank(pointer)
        with self._file_bank_lock:
            for bank in self._file_bank_cache.values():
                bank.remove(pointer)

    def _tombstone_or_defer(self, pointer: bytes) -> None:
        """Physically tombstone now, or defer until in-flight queries drain.

        The metadata delete has already published atomically, so no NEW
        query will plan the file; deferral only protects queries that
        planned before the merge completed.
        """
        # Drop the sparse-probe mapping eagerly (in-flight views keep it
        # alive via refcounting; new queries never plan this pointer).
        with self._bank_mmap_lock:
            self._bank_mmaps.pop(pointer, None)
        with self._query_track_lock:
            if self._active_query_ids:
                # Wait only on the queries active RIGHT NOW — later queries
                # planned after the metadata delete never see this pointer.
                self._deferred_tombstones.append((pointer, set(self._active_query_ids)))
                return
        self._tombstone_everywhere(pointer)

    def _run_query_inner(
        self,
        q: Query,
        compiled_regex,
        result_queue: queue.Queue,
        error_queue: Optional[queue.Queue],
        stats_queue: Optional[queue.Queue],
        cancel_event: Optional[threading.Event],
        file_pointers: Optional[set] = None,
    ) -> None:
        # Row bloom AND the regex field guard prune together (reference :949).
        prune_query = and_bloom_queries(q.bloom, regex_field_guard_bloom_query(q.regex))
        timing: dict = {"t0": time.monotonic()}
        try:
            jobs = self._plan_query_jobs(
                q, prune_query, stats_queue, file_pointers, timing=timing
            )
        except Exception as exc:
            try_put(error_queue, exc)
            result_queue.put(None)
            return
        finally:
            timing["plan_s"] = round(time.monotonic() - timing["t0"], 4)

        if not jobs:
            timing["jobs"] = 0
            self._record_query_timing(timing)
            result_queue.put(None)
            return

        # Candidate-scan pre-filter for the decode stage (scan.py): sound
        # necessary-condition substring pruning over the prune query PLUS
        # each regex pattern's mandatory literal (regex-only queries would
        # otherwise JSON-parse every row of surviving blocks). Sound ONLY
        # for the default tokenizer: its tokens are whitespace-split
        # substrings of the stored value text, while a custom tokenizer may
        # emit tokens (stems, n-grams, ...) that never appear verbatim in
        # the raw bytes — pruning on those would drop matching rows.
        from .scan import compile_scan_plan, regex_scan_query

        if self.config.tokenizer is basic_whitespace_lower_tokenizer:
            scan_query = and_bloom_queries(prune_query, regex_scan_query(q.regex))
            scan_plan = compile_scan_plan(scan_query, self.config.delimiter)
        else:
            scan_plan = None

        # Native exact verification: the bloom AST re-verifies in C++ over
        # the raw row bytes (GIL-free); only matching rows JSON-parse. Rows
        # the native walk can't prove bit-exact fall back to the Python
        # spec. Regex stays a Python final AND stage on the survivors.
        verify_plan = None
        if (
            q.bloom is not None
            and q.bloom.expression is not None
            and self.config.tokenizer is basic_whitespace_lower_tokenizer
            and len(self.config.delimiter) == 1
            and ord(self.config.delimiter) < 128
            and _native_ingest_available()
        ):
            vterms = compile_bloom_terms(q.bloom)
            if vterms is not None:
                verify_plan = _NativeVerifyPlan(
                    expression=q.bloom.expression,
                    terms=vterms,
                    conds=[
                        (
                            int(vterms.ks_idx[i]),
                            (c.field or "").encode("utf-8"),
                            (c.token or "").encode("utf-8"),
                        )
                        for i, c in enumerate(vterms.conditions)
                    ],
                    delimiter=ord(self.config.delimiter),
                )

        # Serving mode: every surviving block already pinned in the device
        # row cache scans in ONE batched launch up front (warm queries then
        # cost ~one scan launch total instead of one per block); cold
        # blocks decode + pin inside their tasks as usual.
        prescanned: dict = {}
        t_prescan = time.monotonic()
        if self._row_cache is not None and scan_plan is not None:
            if (
                self._warmup_active.is_set()
                and not self._warmup_scan_ready.is_set()
            ):
                # Scan programs are still compiling: a device launch now
                # would jit inline for seconds (captured: a 15.7 s prescan
                # stall 11 s into warmup). Route every pinned block through
                # the native disk-scan path this query (~10-30 ms/block);
                # the sentinel tells _block_task not to device-scan either.
                prescanned = {"__scan_cold__": True}
                timing["scan_cold_gate"] = True
            else:
                already_pinned = []
                for job in jobs:
                    pinned = self._row_cache.get(
                        (job.file_pointer, job.block.offset)
                    )
                    if pinned is not None:
                        already_pinned.append(pinned)
                if already_pinned:
                    try:
                        prescanned = self._row_cache.scan_many(
                            already_pinned, scan_plan.needles
                        )
                    except Exception:
                        logger.exception(
                            "batched row-cache scan failed; per-block fallback"
                        )
                timing["pinned"] = len(already_pinned)
        timing["prescan_s"] = round(time.monotonic() - t_prescan, 4)

        # Block work runs on the SHARED executor (bounded across all
        # queries); the global semaphore still bounds in-flight blocks. Each
        # job is an independent future, so one failing block reports to
        # error_queue while every other block still completes — the
        # reference's per-worker error semantics, minus the lost worker.
        futures = [
            self._block_pool.submit(
                self._block_task,
                q, compiled_regex, scan_plan, verify_plan, job, result_queue,
                error_queue, stats_queue, cancel_event, prescanned,
            )
            for job in jobs
        ]
        t_blocks = time.monotonic()
        futures_wait(futures)
        timing["jobs"] = len(jobs)
        timing["blocks_s"] = round(time.monotonic() - t_blocks, 4)
        self._record_query_timing(timing)
        result_queue.put(None)

    def _record_query_timing(self, timing: dict) -> None:
        timing["total_s"] = round(time.monotonic() - timing.pop("t0"), 4)
        timing["end_ts"] = round(time.time(), 3)
        self._query_timings.append(timing)

    def _plan_query_jobs(
        self,
        q: Query,
        prune_query: Optional[BloomQuery],
        stats_queue: Optional[queue.Queue],
        file_pointers: Optional[set] = None,
        timing: Optional[dict] = None,
    ) -> list[_DataBlockJob]:
        """Hierarchical prune: prefilter → file bloom → block bloom.

        Returns only the (file, block) jobs whose blocks survived all filter
        stages; bloom-skipped blocks emit stats immediately (skipped=True).
        """
        terms = compile_bloom_terms(prune_query)

        maybe_files = self.meta_store.get_maybe_files_for_query(q.prefilter)
        if file_pointers is not None:
            maybe_files = [mf for mf in maybe_files if mf.pointer in file_pointers]
            missing = set(file_pointers) - {mf.pointer for mf in maybe_files}
            if missing:
                raise StaleFileAssignmentError(
                    f"{len(missing)} assigned file(s) no longer listed (merged "
                    "or expired since the coordinator's snapshot); retry the "
                    "query for a consistent view"
                )
        if not maybe_files:
            return []

        # --- FILE-LEVEL: batched probe over all candidate files, grouped by
        # file bloom params (one bank per group instead of per-file tests).
        if terms is not None:
            surviving = []
            groups: dict[tuple, list] = {}
            for mf in maybe_files:
                triple = mf.metadata.bloom_filters
                if triple is None:
                    # Warn-and-pass: a file without filters can't be pruned
                    # but must stay searchable (reference :885-905).
                    logger.warning(
                        "file %r has no file-level filters; passing through", mf.pointer
                    )
                    surviving.append(mf)
                    continue
                groups.setdefault(
                    (triple.field.m_bits, triple.field.k, triple.field.layout), []
                ).append(mf)
            for (m_bits, k, layout), group_files in groups.items():
                bank, col_idx = self._file_level_bank((m_bits, k, layout), group_files)
                match = probe_bank_host(bank, terms, m_bits, k, layout)[:, col_idx]
                ok = evaluate_match_expression(
                    prune_query.expression, terms, match, len(group_files)
                )
                surviving.extend(mf for mf, good in zip(group_files, ok) if good)
            maybe_files = surviving

        # --- BLOCK-LEVEL: batched bank probes. All candidate (file, group)
        # banks are probed together — on the device backend this is ONE
        # kernel launch per (m, k) superbank covering every resident block.
        jobs: list[_DataBlockJob] = []
        if terms is None:
            for mf in maybe_files:
                jobs.extend(_DataBlockJob(mf.pointer, blk) for blk in mf.metadata.data_blocks)
            return jobs

        t_probe = time.monotonic()
        group_ok = self._probe_blocks(maybe_files, terms, prune_query, timing=timing)
        if timing is not None:
            timing["probe_s"] = round(time.monotonic() - t_probe, 4)
        for mf in maybe_files:
            num_groups = len(mf.metadata.bank_groups)
            for blk in mf.metadata.data_blocks:
                if not (0 <= blk.bank_group < num_groups) or not (
                    0
                    <= blk.bank_col
                    < mf.metadata.bank_groups[blk.bank_group].num_blocks
                ):
                    # Invalid bank coordinates (foreign/corrupt metadata):
                    # blocks without testable filters decode unconditionally
                    # (warn-and-pass, reference :885-905).
                    logger.warning(
                        "block at %r+%d has no probeable filters; decoding",
                        mf.pointer, blk.offset,
                    )
                    jobs.append(_DataBlockJob(mf.pointer, blk))
                    continue
                ok_vector = group_ok.get((mf.pointer, blk.bank_group))
                if ok_vector is not None and bool(ok_vector[blk.bank_col]):
                    jobs.append(_DataBlockJob(mf.pointer, blk))
                else:
                    try_put(
                        stats_queue,
                        BlockStats(
                            file_pointer=mf.pointer,
                            block_offset=blk.offset,
                            total_rows=blk.rows,
                            total_bytes=blk.size,
                            bloom_filter_skipped=True,
                        ),
                    )
        return jobs

    def _file_level_bank(self, key: tuple, group_files) -> tuple[np.ndarray, np.ndarray]:
        """Incremental file-level bank for a param group -> (bank, columns)."""
        with self._file_bank_lock:
            cached = self._file_bank_cache.get(key)
            if cached is None:
                cached = _HostFileBank((key[0] + 31) // 32)
                self._file_bank_cache[key] = cached
            return cached.ensure(group_files)

    def _probe_blocks(
        self,
        maybe_files,
        terms: CompiledBloomTerms,
        prune_query: BloomQuery,
        timing: Optional[dict] = None,
    ) -> dict[tuple[bytes, int], np.ndarray]:
        """Probe every needed (file, bank-group) against the query terms.

        Returns {(pointer, group_idx): bool[num_blocks] survival vector}.
        Uses the device backend's HBM-resident superbanks when available
        (banks load once per file, then queries never touch disk for
        filters); otherwise reads bank groups from files and probes on host.
        """

        def make_loader(pointer: bytes, group):
            def load() -> np.ndarray:
                with self.data_store.open_file(pointer) as fh:
                    return read_bank_group(fh, group)

            return load

        needed: list[tuple] = []
        for mf in maybe_files:
            for gi in sorted({blk.bank_group for blk in mf.metadata.data_blocks}):
                if not (0 <= gi < len(mf.metadata.bank_groups)):
                    continue  # invalid coords: the block passes unprobed
                group = mf.metadata.bank_groups[gi]
                needed.append((mf.pointer, gi, group))

        result: dict[tuple[bytes, int], np.ndarray] = {}
        # Large NON-resident bank groups take the sparse cold path: probe
        # only the rows the terms touch (KBs of seeks instead of reading the
        # whole group — cold needle queries become I/O-proportional to the
        # probe) and warm the CRC-verified full bank in the background so
        # the next query is resident.
        sparse: list[tuple] = []
        host_fallback: list[tuple] = []
        host_cached: list[tuple] = []
        if self._device_backend is not None:
            from .bloom.probe import compile_cnf_clauses, is_flat_and_expression

            backend = self._device_backend
            # Fuse the expression into the device program so only a [B]
            # survivor bitmap comes back: flat-AND (the dominant shape) via
            # the dedicated reduction, every other monotone AND/OR tree via
            # its CNF clause mask (compile_cnf_clauses; None = too many
            # clauses, host evaluation of the full bitmap instead).
            flat_and = is_flat_and_expression(prune_query.expression)
            cnf_mask = compile_cnf_clauses(prune_query.expression, terms)
            requests = []
            # One probe snapshots EVERY requested segment simultaneously, so
            # a single query's resident set must fit the bank cache — beyond
            # that, _ensure_resident of later groups evicts earlier ones and
            # probe_groups churns. Admit up to ~90% of the budget (headroom
            # for superbank capacity padding); overflow goes sparse when
            # row CRCs allow, else to the host probe fallback.
            admit_budget = max(int(backend.cache_bytes * 0.9), 1)
            admitted = 0
            # Synchronous-promotion cap (config.bank_promote_bytes_per_query):
            # resident groups probe for free, but each NON-resident group a
            # query promotes inline is a full-group upload on the query's
            # critical path (hundreds of ms each through remote-attached
            # chips — the measured 18x first-query swing, and the 8-16 s
            # during-warmup stalls while banks were still loading). Past the
            # cap the group is probed on host NOW (reference-speed) and a
            # background warm promotes it for the NEXT query.
            promote_budget = max(self.config.bank_promote_bytes_per_query, 0)
            # Mid-warmup, the warm thread is already loading every group in
            # file order: a query promoting inline would double-upload (two
            # concurrent loaders of one segment both read AND stage) and
            # put seconds of h2d on its own critical path — host-probe the
            # not-yet-loaded tail instead, and skip the background warms
            # (redundant with warmup's own pass).
            in_warmup = self._warmup_active.is_set()
            if in_warmup:
                promote_budget = 0
            # Until warmup's probe compile pass finishes, a device probe
            # launch would jit inline — and the compile queues behind the
            # AOT passes' ~40 programs on the (possibly remote) compiler,
            # which held one captured query for 186 s. Host-probe instead
            # (disk read + numpy, the reference's own speed); sparse cold
            # probes stay sparse (pure host seeks, no jit either way).
            probe_cold = in_warmup and not self._warmup_probe_ready.is_set()
            if probe_cold and timing is not None:
                timing["probe_cold_gate"] = True
            promoted = 0
            for pointer, gi, group in needed:
                mk = (group.m_bits, group.k, group.params.layout)
                # Sparse probing requires per-row CRCs (older files lack
                # them): unverified bytes must never disqualify a block.
                sparse_ok = (
                    group.size > SPARSE_BANK_BYTES
                    and group.row_crc_offset is not None
                )
                if probe_cold:
                    # Sparse-capable groups go sparse REGARDLESS of device
                    # residency: the gate forbids the device launch anyway,
                    # and seek-reading the probed rows (KBs) beats a full
                    # group read — the first gated query full-reading the
                    # resident groups mid-pin-pass measured 5.5 s.
                    if sparse_ok:
                        sparse.append((pointer, gi, group))
                    else:
                        # host_cached, not host_fallback: gated queries
                        # repeat every ~seconds, and the warmup pin pass
                        # streams GBs through the page cache — re-reading
                        # banks per query is seconds of contended disk.
                        # The in-process LRU (bank_cache_bytes-bounded,
                        # pre-primed by warmup) makes gated probes memory
                        # hits; warmup releases it when the gate lifts.
                        host_cached.append((pointer, gi, group))
                    continue
                resident = backend.is_resident(
                    mk, backend.segment_key(pointer, gi)
                )
                if sparse_ok and not resident:
                    sparse.append((pointer, gi, group))
                elif admitted + group.size > admit_budget:
                    # Single-query cache overflow (existing rule): the one
                    # probe snapshot can't hold everything.
                    if sparse_ok:
                        sparse.append((pointer, gi, group))
                    else:
                        host_fallback.append((pointer, gi, group))
                elif resident:
                    admitted += group.size
                    requests.append((pointer, gi, mk, make_loader(pointer, group)))
                elif promoted + group.size <= promote_budget:
                    promoted += group.size
                    admitted += group.size
                    requests.append((pointer, gi, mk, make_loader(pointer, group)))
                else:
                    host_fallback.append((pointer, gi, group))
                    if not in_warmup:
                        self._schedule_bank_warm(pointer, gi, group)
            if timing is not None and promoted:
                timing["bank_promote_bytes"] = promoted
            if requests:
                try:
                    matches = backend.probe_groups(
                        requests, terms, reduce_and=flat_and, clause_mask=cnf_mask
                    )
                except RuntimeError:
                    # Residency kept churning (concurrent queries competing
                    # for an undersized cache): degrade to host probing
                    # rather than failing the query.
                    logger.warning(
                        "device bank probe churned (cache %.0f MB, query "
                        "needs %.0f MB); probing %d groups on host",
                        backend.cache_bytes / 1e6,
                        admitted / 1e6,
                        len(requests),
                    )
                    group_of = {(p, gi): g for p, gi, g in needed}
                    host_fallback.extend(
                        (p, gi, group_of[(p, gi)]) for p, gi, _mk, _ld in requests
                    )
                else:
                    for pointer, gi, mk, _loader in requests:
                        match = matches[(pointer, gi)]
                        if match.shape[0] == 1 and (flat_and or cnf_mask is not None):
                            # Expression fused on-device: [1, B] survivors.
                            result[(pointer, gi)] = np.asarray(match[0])
                        else:
                            result[(pointer, gi)] = np.asarray(
                                evaluate_match_expression(
                                    prune_query.expression, terms, match,
                                    match.shape[1],
                                )
                            )
        else:
            by_pointer: dict[bytes, list[tuple[int, Any]]] = {}
            for pointer, gi, group in needed:
                by_pointer.setdefault(pointer, []).append((gi, group))
            for pointer, groups in by_pointer.items():
                fh = None
                try:
                    for gi, group in groups:
                        bank = self._host_bank(pointer, group)
                        if (
                            bank is None
                            and group.size > SPARSE_BANK_BYTES
                            and group.row_crc_offset is not None
                        ):
                            sparse.append((pointer, gi, group))
                            continue
                        if bank is None:
                            if fh is None:
                                fh = self.data_store.open_file(pointer)
                            bank = read_bank_group(fh, group)
                            self._host_bank_put(pointer, group, bank)
                        match = probe_bank_host(
                            bank, terms, group.m_bits, group.k, group.params.layout
                        )
                        result[(pointer, gi)] = evaluate_match_expression(
                            prune_query.expression, terms, match, group.num_blocks
                        )
                finally:
                    if fh is not None:
                        fh.close()

        if host_cached:
            # During-warmup gated probes: host-probe via the in-process
            # bank LRU (read once, reuse across the gated window).
            by_pointer_hc: dict[bytes, list[tuple[int, Any]]] = {}
            for pointer, gi, group in host_cached:
                by_pointer_hc.setdefault(pointer, []).append((gi, group))
            for pointer, groups in by_pointer_hc.items():
                fh = None
                try:
                    for gi, group in groups:
                        bank = self._host_bank(pointer, group)
                        if bank is None:
                            if fh is None:
                                fh = self.data_store.open_file(pointer)
                            bank = read_bank_group(fh, group)
                            self._host_bank_put(pointer, group, bank)
                        match = probe_bank_host(
                            bank, terms, group.m_bits, group.k,
                            group.params.layout,
                        )
                        result[(pointer, gi)] = evaluate_match_expression(
                            prune_query.expression, terms, match,
                            group.num_blocks,
                        )
                finally:
                    if fh is not None:
                        fh.close()

        if host_fallback:
            # Beyond-budget overflow from the device path: read + probe on
            # host, uncached (these groups were refused residency precisely
            # because the cache can't hold them alongside the rest of the
            # query's set).
            by_pointer_fb: dict[bytes, list[tuple[int, Any]]] = {}
            for pointer, gi, group in host_fallback:
                by_pointer_fb.setdefault(pointer, []).append((gi, group))
            for pointer, groups in by_pointer_fb.items():
                with self.data_store.open_file(pointer) as fh:
                    for gi, group in groups:
                        bank = read_bank_group(fh, group)
                        match = probe_bank_host(
                            bank, terms, group.m_bits, group.k,
                            group.params.layout,
                        )
                        result[(pointer, gi)] = evaluate_match_expression(
                            prune_query.expression, terms, match,
                            group.num_blocks,
                        )

        if sparse:
            from .bloom.probe import probe_rows_sparse
            from .file_format import read_bank_rows, read_bank_rows_buf

            by_pointer_sparse: dict[bytes, list[tuple[int, Any]]] = {}
            for pointer, gi, group in sparse:
                by_pointer_sparse.setdefault(pointer, []).append((gi, group))

            def _probe_file_sparse(item):
                pointer, groups = item
                out = []
                mm = self._bank_mmap(pointer)
                with (
                    contextlib.nullcontext()
                    if mm is not None
                    else self.data_store.open_file(pointer)
                ) as fh:
                    for gi, group in groups:
                        if mm is not None:
                            read = (
                                lambda rows, mm=mm, group=group:
                                read_bank_rows_buf(mm, group, rows)
                            )
                        else:
                            read = (
                                lambda rows, fh=fh, group=group:
                                read_bank_rows(fh, group, rows)
                            )
                        match = probe_rows_sparse(
                            read,
                            terms, group.m_bits, group.k, group.params.layout,
                        )
                        out.append((
                            gi,
                            group,
                            np.asarray(
                                evaluate_match_expression(
                                    prune_query.expression, terms, match,
                                    group.num_blocks,
                                )
                            ),
                        ))
                return pointer, out

            items = list(by_pointer_sparse.items())
            if len(items) == 1:
                probed = [_probe_file_sparse(items[0])]
            else:
                # Fan the per-file seek passes over a small I/O pool: the
                # beyond-bank-cache first query sparse-probes hundreds of
                # files, and serial seek chains leave the disk queue empty
                # (measured on the 33 GB / 454-file dataset, cold page
                # cache: 7.9 s serial -> 0.44 s at 8-way). Exceptions
                # propagate from .map() exactly like the serial loop's.
                probed = list(
                    self._sparse_probe_pool.map(_probe_file_sparse, items)
                )
            for pointer, out in probed:
                for gi, group, arr in out:
                    result[(pointer, gi)] = arr
                    # Mid-warmup the warm thread is already loading groups
                    # in file order — scheduling another warm would
                    # double-read and double-upload the segment.
                    if not self._warmup_active.is_set():
                        self._schedule_bank_warm(pointer, gi, group)
        return result

    # Bounded count of live file mappings; address space only (resident
    # memory is whatever pages the probes touch, i.e. the page cache).
    _BANK_MMAP_CAP = 1024

    def _bank_mmap(self, pointer: bytes):
        """Whole-file read-only mmap for sparse probes, or None when the
        store's handles aren't real files (object stores) or mapping
        fails — callers fall back to the seek-read path."""
        with self._bank_mmap_lock:
            mm = self._bank_mmaps.get(pointer)
            if mm is not None:
                return mm
        import mmap as _mmap

        try:
            fh = self.data_store.open_file(pointer)
        except Exception:
            return None
        try:
            fileno = fh.fileno()
            mm = _mmap.mmap(fileno, 0, access=_mmap.ACCESS_READ)
        except Exception:
            return None  # not a real file / empty / mmap unsupported
        finally:
            try:
                fh.close()  # the mapping holds the pages, not the fd
            except Exception:
                pass
        with self._bank_mmap_lock:
            existing = self._bank_mmaps.get(pointer)
            if existing is not None:
                return existing  # racer won; drop ours via refcounting
            while len(self._bank_mmaps) >= self._BANK_MMAP_CAP:
                self._bank_mmaps.pop(next(iter(self._bank_mmaps)))
            self._bank_mmaps[pointer] = mm
        return mm

    def _schedule_bank_warm(self, pointer: bytes, gi: int, group) -> None:
        """Background full load of a sparse-probed bank group.

        Sparse probes are already per-row CRC-verified (read_bank_rows), so
        this warm is purely a residency optimization: the full group loads
        (and its whole-payload CRC re-verifies) so the next query probes
        the resident bank instead of seeking."""
        key = (pointer, group.offset)
        # Dedup BEFORE the churn admit: a concurrent burst sparse-probing one
        # cold group schedules the same warm many times, and each duplicate
        # would otherwise drain the budget for a load that happens once.
        with self._warm_lock:
            if key in self._warming:
                return
            self._warming.add(key)
        backend = self._device_backend
        if backend is not None:
            # Churn budget: when the dataset's banks exceed the cache, every
            # query sparse-probes the non-resident groups and would schedule
            # their full loads — evicting other groups and re-uploading GBs
            # per query forever (sparse probes stay correct either way).
            size = getattr(group, "size", 0) or 0
            if (
                backend.total_bytes() + size > backend.cache_bytes
                and not self._bank_churn.admit(size)
            ):
                with self._warm_lock:
                    self._warming.discard(key)
                return

        def warm():
            try:
                # Defer to in-flight queries BEFORE the load too: the full
                # group read (hundreds of MB at scale) contends for the
                # disk and the (few-core) CPU with the very query whose
                # sparse probes scheduled this warm — measured as a 2.1 s
                # first-query probe stage at xlscale. Bounded so sustained
                # query streams can't starve residency promotion forever.
                deadline = time.monotonic() + 30.0
                while self._pins_should_yield() and time.monotonic() < deadline:
                    time.sleep(0.01)
                if self._stop_event.is_set():
                    return  # engine stopping: files may already be tombstoned
                if self._device_backend is not None:
                    mk = (group.m_bits, group.k, group.params.layout)
                    seg_key = self._device_backend.segment_key(pointer, gi)

                    def load() -> np.ndarray:
                        with self.data_store.open_file(pointer) as fh:
                            return read_bank_group(fh, group)

                    self._device_backend._ensure_resident(
                        pointer, mk, seg_key, load,
                        yield_to=self._pins_should_yield,
                    )
                else:
                    if self._host_bank(pointer, group) is None:
                        with self.data_store.open_file(pointer) as fh:
                            bank = read_bank_group(fh, group)
                        self._host_bank_put(pointer, group, bank)
            except FileNotFoundError:
                pass  # merged/tombstoned meanwhile: nothing left to warm
            except BackendReleasedError:
                pass  # raced engine stop; the backend refused the upload
            except Exception:
                logger.exception(
                    "background bank warm failed for %r group@%d (sparse probes "
                    "of this group are UNVERIFIED until a full read succeeds)",
                    pointer, group.offset,
                )
            finally:
                with self._warm_lock:
                    self._warming.discard(key)

        try:
            self._warm_pool.submit(warm)
        except RuntimeError:
            # Pool shut down (stop() raced this query): the sparse probe
            # already produced correct results — a background residency
            # optimization must not fail the query (same guard as
            # _submit_background_pin).
            with self._warm_lock:
                self._warming.discard(key)

    def _host_bank(self, pointer: bytes, group) -> Optional[np.ndarray]:
        key = (pointer, group.offset)
        with self._host_bank_lock:
            bank = self._host_bank_cache.pop(key, None)
            if bank is not None:
                self._host_bank_cache[key] = bank  # LRU bump
            return bank

    def _host_bank_put(self, pointer: bytes, group, bank: np.ndarray) -> None:
        with self._host_bank_lock:
            key = (pointer, group.offset)
            if key in self._host_bank_cache:
                return
            self._host_bank_cache[key] = bank
            self._host_bank_bytes += bank.nbytes
            while (
                self._host_bank_bytes > self.config.bank_cache_bytes
                and len(self._host_bank_cache) > 1
            ):
                oldest = next(iter(self._host_bank_cache))
                self._host_bank_bytes -= self._host_bank_cache.pop(oldest).nbytes

    def _invalidate_host_bank(self, pointer: bytes) -> None:
        with self._host_bank_lock:
            for key in [k for k in self._host_bank_cache if k[0] == pointer]:
                self._host_bank_bytes -= self._host_bank_cache.pop(key).nbytes

    def _block_task(
        self,
        q: Query,
        compiled_regex,
        scan_plan,
        verify_plan: Optional[_NativeVerifyPlan],
        job: _DataBlockJob,
        result_queue: queue.Queue,
        error_queue: Optional[queue.Queue],
        stats_queue: Optional[queue.Queue],
        cancel_event: Optional[threading.Event],
        prescanned: Optional[dict] = None,
    ) -> None:
        if cancel_event is not None and cancel_event.is_set():
            return
        with self._query_semaphore:
            try:
                self._process_data_block(
                    q, compiled_regex, scan_plan, verify_plan, job,
                    result_queue, stats_queue, cancel_event, prescanned,
                )
            except Exception as exc:
                try_put(error_queue, exc)  # this block fails; others continue

    def _process_data_block(
        self,
        q: Query,
        compiled_regex,
        scan_plan,
        verify_plan: Optional[_NativeVerifyPlan],
        job: _DataBlockJob,
        result_queue: queue.Queue,
        stats_queue: Optional[queue.Queue],
        cancel_event: Optional[threading.Event],
        prescanned: Optional[dict] = None,
    ) -> None:
        """Decode a surviving block, candidate-scan it, and exactly verify.

        The reference parses + gjson-verifies every row (:1156-1194); here the
        native substring scan prunes to candidate rows first and only those
        are JSON-parsed — same exact results, far less parse work.
        """
        from .scan import candidate_rows, evaluate_plan, split_rows_arrays

        start = time.monotonic()
        stats = BlockStats(
            file_pointer=job.file_pointer,
            block_offset=job.block.offset,
            total_rows=job.block.rows,
            total_bytes=job.block.size,
        )
        try:
            cache_key = (job.file_pointer, job.block.offset)
            pinned = self._row_cache.get(cache_key) if self._row_cache is not None else None
            mask = None
            scanned_inline = None
            # During-warmup scan gate (see _plan... prescan): the device
            # scan program for this launch isn't compiled yet, so treat the
            # pinned block as cold for SCANNING — read + native-scan from
            # the store — while keeping the pin (skip_pin) for the device
            # path once the gate lifts.
            scan_cold = bool(prescanned) and prescanned.get("__scan_cold__", False)
            skip_pin = False
            if pinned is not None and scan_cold and scan_plan is not None:
                pinned = None
                skip_pin = True
            if pinned is not None:
                data = pinned.data
                offsets, lengths = pinned.row_offsets, pinned.row_lengths
            else:
                with self.data_store.open_file(job.file_pointer) as fh:
                    compressed = read_block_rows_compressed(fh, job.block, verify=False)
                # Hot path: one GIL-free native call does CRC verify,
                # decompress, row split, and the needle scan together.
                from . import native as _native

                processed = _native.process_block(
                    compressed,
                    job.block.compression,
                    job.block.row_data_hash,
                    job.block.uncompressed_size,
                    scan_plan.needles if scan_plan is not None else [],
                ) if _native.available() else None
                if processed is not None:
                    data_arr, offsets, lengths, scanned_inline = processed
                    data = data_arr  # bytes conversion deferred to the pin sites
                else:
                    from .checksum import crc32c as _crc32c

                    if _crc32c(compressed) != job.block.row_data_hash:
                        from .file_format import InvalidHashError

                        raise InvalidHashError("row data CRC mismatch")
                    data = decompress_block(
                        compressed, job.block.compression, job.block.uncompressed_size
                    )
                    _, offsets, lengths = split_rows_arrays(data)
                if self._row_cache is not None and not skip_pin:
                    if self.config.row_cache_async_pins and processed is not None:
                        # The native pipeline already scanned this block
                        # inline; the pin is a pure cache-warm upload —
                        # keep it off this query's critical path (through
                        # remote-attached chips an upload is ~100s of ms).
                        # Admission runs FIRST: a denied refill (the
                        # beyond-HBM steady state) must not pay the
                        # multi-MB bytes copy or the fetcher build.
                        nbytes = data.nbytes if not isinstance(data, bytes) else len(data)
                        if self._admit_background_pin(cache_key, nbytes):
                            try:
                                pin_data = (
                                    data if isinstance(data, bytes) else bytes(data)
                                )
                                comp_index = self._comp_index_for(
                                    job.block, compressed
                                )
                                fetcher = self._make_row_fetcher(
                                    job.file_pointer, job.block,
                                    comp_index=comp_index,
                                )
                            except BaseException:
                                # Payload prep failed: release the admission
                                # registration or this block (and, after 8
                                # leaks, ALL blocks) can never background-pin
                                # again.
                                with self._bg_pin_lock:
                                    self._bg_pins.discard(cache_key)
                                raise
                            self._submit_background_pin(
                                cache_key, pin_data, offsets, lengths, fetcher,
                                sidecar=(
                                    (job.file_pointer, job.block, comp_index)
                                    if self._serving_cache is not None
                                    else None
                                ),
                            )
                    else:
                        if not isinstance(data, bytes):
                            data = bytes(data)
                        comp_index = self._comp_index_for(job.block, compressed)
                        fetcher = self._make_row_fetcher(
                            job.file_pointer, job.block, comp_index=comp_index
                        )
                        prepacked = self._sidecar_pack_store(
                            job.file_pointer, job.block, data, offsets,
                            lengths, comp_index,
                        )
                        pinned = self._row_cache.pin(
                            cache_key, data, offsets, lengths, fetcher=fetcher,
                            prepacked=prepacked,
                        )
            num_rows = offsets.shape[0]
            stats.rows_processed = num_rows
            stats.bytes_processed = int(lengths.sum())

            candidate_idx = None
            if scan_plan is not None:
                # Numeric-token needles only prune blocks whose metadata
                # attests canonical re-serialization (scan._numeric_unsafe).
                trust_numeric = bool(job.block.rows_canonical)
                if scanned_inline is not None:
                    mask = evaluate_plan(
                        scan_plan, scanned_inline, num_rows, trust_numeric
                    )
                elif pinned is not None:
                    # Serving mode: the needle scan runs on-device over the
                    # HBM-pinned rows; warm blocks were scanned in ONE
                    # batched launch at planning time, cold re-pins scan here.
                    scanned = (prescanned or {}).get(cache_key)
                    if scanned is None:
                        scanned = self._row_cache.scan(pinned, scan_plan.needles)
                    mask = evaluate_plan(
                        scan_plan, scanned, num_rows, trust_numeric
                    )
                else:
                    buf = np.frombuffer(data, dtype=np.uint8) if isinstance(data, bytes) else data
                    mask = candidate_rows(
                        scan_plan, buf, offsets, lengths, trust_numeric
                    )
                if mask is not None:
                    candidate_idx = np.nonzero(mask)[0]
            if candidate_idx is None:
                candidate_idx = np.arange(num_rows, dtype=np.int64)

            if pinned is not None and data is None:
                # Shadow-free serving: pull exactly the candidate rows back
                # from the store (ranged read + chunk-granular decode); all
                # downstream indices become local to the compact buffer.
                data, offsets, lengths = pinned.fetch_rows(candidate_idx)
                candidate_idx = np.arange(offsets.shape[0], dtype=np.int64)

            tokenizer = self.config.tokenizer
            delimiter = self.config.delimiter
            data_is_bytes = isinstance(data, (bytes, bytearray))

            # Native exact verification over the candidate rows: the bloom
            # AST evaluates in C++ over raw bytes (GIL-free) and only rows
            # it PROVES matching (or flags for Python fallback) JSON-parse.
            verified_ok = verified_fallback = None
            if verify_plan is not None and len(candidate_idx):
                from . import native as _nat

                buf = (
                    np.frombuffer(data, dtype=np.uint8) if data_is_bytes else data
                )
                res = _nat.verify_rows(
                    buf,
                    np.asarray(offsets, dtype=np.int64)[candidate_idx],
                    np.asarray(lengths, dtype=np.int64)[candidate_idx],
                    verify_plan.conds,
                    verify_plan.delimiter,
                )
                if res is not None:
                    vmatch, verified_fallback = res
                    verified_ok = np.asarray(
                        evaluate_match_expression(
                            verify_plan.expression, verify_plan.terms,
                            vmatch, len(candidate_idx),
                        )
                    )

            regex_expr = (
                compiled_regex.expression if compiled_regex is not None else None
            )
            for j, i in enumerate(candidate_idx):
                if cancel_event is not None and cancel_event.is_set():
                    return
                if verified_ok is not None and not verified_fallback[j]:
                    if not verified_ok[j]:
                        continue
                    payload = data[offsets[i] : offsets[i] + lengths[i]]
                    if not data_is_bytes:
                        payload = payload.tobytes()
                    parsed = json.loads(payload)
                    # Bloom part proven natively; regex is the final AND
                    # stage (reference TestGJSONForQuery, tokenizer.go:411).
                    if regex_expr is None or row_matches_regex_expression(
                        parsed, regex_expr, delimiter
                    ):
                        result_queue.put(parsed)
                    continue
                payload = data[offsets[i] : offsets[i] + lengths[i]]
                if not data_is_bytes:
                    payload = payload.tobytes()
                parsed = json.loads(payload)
                if row_matches_query(parsed, q.bloom, compiled_regex, delimiter, tokenizer):
                    result_queue.put(parsed)
        finally:
            stats.duration = time.monotonic() - start
            try_put(stats_queue, stats)


@dataclass
class _SourceBlock:
    """A block slated for merging, with its origin file handle context."""

    pointer: bytes
    metadata: FileMetadata
    block: DataBlockMetadata


class _MergeLeaseLost(RuntimeError):
    """Merge lease expired and was not renewable: abort remaining groups
    (publishing without the lease could make two mergers' outputs visible)."""


class _Merger:
    """Merge/compaction (reference Merge, bloom_tree_engine.go:1206-1372).

    Behavior preserved:
    - Files group only at identical *file-level* bloom params (:1497-1509);
      groups fill greedily by ascending average block size, bounded by
      ``max_file_size`` and ``max_files_to_merge_per_operation``, and require
      at least one mergeable row-group pair (:1514-1603).
    - File-level filters OR-merge (:1606-1623).
    - Blocks bucket by partition (:1661-1673); blocks are mergeable only at
      same partition + same block bloom params + combined row/byte caps
      (:1374-1399). Merged blocks OR their filters, union minmax, interleave
      rows round-robin, and re-compress to the engine's *current* codec
      (:1830-1917); unmergeable blocks raw-copy byte-for-byte, keeping their
      original codec and params (:1762-1786).
    - New files publish atomically (meta update with writes+deletes) and old
      files tombstone after (:1340-1353).

    Additions over the reference:
    - TTL expiry: blocks whose ``created_at_ms`` is older than
      ``ttl_seconds`` are dropped during merge (README.md:283-287 describes
      this but the reference never implemented it). A merged block's
      ``created_at_ms`` is the newest of its sources, so data never expires
      *early*.
    - Merged blocks stamp their *source* bloom params (the params the OR'd
      filter actually has) rather than blindly stamping current config.
    """

    def __init__(self, engine: "BloomSearchEngine", lease=None):
        self.engine = engine
        self.config = engine.config
        self.lease = lease

    def _may_publish(self) -> bool:
        """Renew the merge lease before an atomic metadata publish.

        False = the lease expired and could not be re-acquired (another
        merger may already hold it): publishing now could make two mergers'
        outputs over the same source rows visible — permanent duplicate
        results. The merge aborts its remaining groups; temp output files
        are never referenced by metadata, so they are invisible garbage.
        """
        if self.lease is None:
            return True
        if self.lease.renew():
            return True
        logger.warning("merge lease lost mid-merge; aborting before publish")
        return False

    def merge(self) -> MergeStats:
        start = time.monotonic()
        stats = MergeStats()
        files = self.engine.meta_store.get_maybe_files_for_query(None)
        if len(files) < 2 and not self._has_expired_blocks(files):
            stats.duration = time.monotonic() - start
            return stats

        groups = self._identify_file_merge_groups(files)
        try:
            for group in groups:
                self._execute_merge_group(group, stats)
        except _MergeLeaseLost:
            pass  # published groups stand; the rest wait for a next merge()

        stats.duration = max(time.monotonic() - start, 1e-9)
        stats.rows_per_second = stats.rows_processed / stats.duration
        stats.bytes_per_second = stats.bytes_processed / stats.duration
        return stats

    # -- expiry ---------------------------------------------------------

    def _now_ms(self) -> int:
        return int(time.time() * 1000)

    def _is_expired(self, block: DataBlockMetadata) -> bool:
        predicate = self.config.ttl_predicate
        if predicate is not None and predicate(block):
            return True
        ttl = self.config.ttl_seconds
        if ttl is None or block.created_at_ms <= 0:
            return False
        return self._now_ms() - block.created_at_ms > ttl * 1000

    def _has_expired_blocks(self, files) -> bool:
        return any(
            self._is_expired(blk) for mf in files for blk in mf.metadata.data_blocks
        )

    # -- grouping -------------------------------------------------------

    def _blocks_are_mergeable(self, a: DataBlockMetadata, b: DataBlockMetadata) -> bool:
        """(reference dataBlocksAreMergeable, :1374-1399)"""
        return (
            a.partition_id == b.partition_id
            and a.bloom_expected_items == b.bloom_expected_items
            and a.bloom_false_positive_rate == b.bloom_false_positive_rate
            and a.bloom_layout == b.bloom_layout
            and a.rows + b.rows <= self.config.max_row_group_rows
            and a.uncompressed_size + b.uncompressed_size <= self.config.max_row_group_bytes
        )

    def _has_compatible_row_groups(self, candidate: MaybeFile, members: list[MaybeFile]) -> bool:
        for member in members:
            for a in candidate.metadata.data_blocks:
                for b in member.metadata.data_blocks:
                    if self._blocks_are_mergeable(a, b):
                        return True
        return False

    def _identify_file_merge_groups(self, files) -> list[list[MaybeFile]]:
        """(reference identifyFileMergeGroups, :1491-1603)"""
        by_params: dict[tuple, list[MaybeFile]] = {}
        for mf in files:
            if mf.metadata.bloom_filters is None:
                continue  # filter-less (foreign) files are never merged
            key = (
                mf.metadata.bloom_expected_items,
                mf.metadata.bloom_false_positive_rate,
                mf.metadata.bloom_filters.field.layout,
            )
            by_params.setdefault(key, []).append(mf)

        groups: list[list[MaybeFile]] = []
        for candidates in by_params.values():
            def sort_key(mf: MaybeFile):
                blocks = mf.metadata.data_blocks
                avg = mf.size / len(blocks) if blocks else float(mf.size)
                return (avg, mf.size)

            candidates = sorted(candidates, key=sort_key)
            used: set[int] = set()
            for i, seed in enumerate(candidates):
                if i in used:
                    continue
                group = [seed]
                group_size = seed.size
                for j in range(i + 1, len(candidates)):
                    if j in used or len(group) >= self.config.max_files_to_merge_per_operation:
                        continue
                    other = candidates[j]
                    if group_size + other.size > self.config.max_file_size:
                        continue
                    if not self._has_compatible_row_groups(other, group):
                        continue
                    group.append(other)
                    group_size += other.size
                    used.add(j)
                if len(group) >= 2:
                    used.add(i)
                    groups.append(group)
                elif (
                    self.config.ttl_seconds is not None
                    or self.config.ttl_predicate is not None
                ) and any(
                    self._is_expired(blk) for blk in seed.metadata.data_blocks
                ):
                    # Solo rewrite purely to drop expired blocks.
                    used.add(i)
                    groups.append(group)
        return groups

    # -- execution ------------------------------------------------------

    def _execute_merge_group(self, group: list[MaybeFile], stats: MergeStats) -> None:
        """(reference executeMergeGroup, :1606-1702)"""
        engine = self.engine

        # Collect live (non-expired) blocks, bucketed by partition.
        by_partition: dict[str, list[_SourceBlock]] = {}
        expired = 0
        for mf in group:
            for blk in mf.metadata.data_blocks:
                if self._is_expired(blk):
                    expired += 1
                    continue
                by_partition.setdefault(blk.partition_id, []).append(
                    _SourceBlock(mf.pointer, mf.metadata, blk)
                )

        if not by_partition:
            # Every source block expired: publish a deletes-only metadata
            # update — a zero-block output file could never be grouped for
            # a later merge (no row-group pair, no expired block) and would
            # haunt query planning forever, one per full-expiry merge.
            logger.info(
                "merge: all %d block(s) expired; deleting %d file(s)",
                expired, len(group),
            )
            if not self._may_publish():
                raise _MergeLeaseLost()
            engine.meta_store.update(
                [], [DeleteOperation(mf.pointer) for mf in group]
            )
            for mf in group:
                engine._tombstone_or_defer(mf.pointer)
            stats.files_processed += len(group)
            return

        # File-level filters: OR-merge the sources (identical params by
        # grouping) — exact when every source block survives. When expiry
        # DROPS blocks, ORing stale source filters would keep the dropped
        # blocks' keys matching at file level forever (FPR drag compounding
        # with every expiry-merge generation), so rebuild a fresh triple
        # from the surviving rows instead; survivors are re-tokenized as
        # they stream through copy/merge below (VERDICT r3 item 8).
        rebuild_filters: Optional[BloomFilters] = None
        if expired:
            logger.info("merge: dropping %d expired block(s)", expired)
            rebuild_filters = BloomFilters.from_params(
                BloomParams(
                    group[0].metadata.bloom_expected_items,
                    group[0].metadata.bloom_false_positive_rate,
                    layout=group[0].metadata.bloom_filters.field.layout,
                )
            )
            file_filters = rebuild_filters
        else:
            file_filters = group[0].metadata.bloom_filters.copy()
            for mf in group[1:]:
                file_filters.merge(mf.metadata.bloom_filters)

        writer_fh, new_pointer = engine.data_store.create_file()
        try:
            writer = DataFileWriter(
                writer_fh,
                BloomParams(
                    group[0].metadata.bloom_expected_items,
                    group[0].metadata.bloom_false_positive_rate,
                ),
            )
            open_files: dict[bytes, Any] = {}

            def fh_for(pointer: bytes):
                if pointer not in open_files:
                    open_files[pointer] = engine.data_store.open_file(pointer)
                return open_files[pointer]

            # Decoded-bank memo for THIS merge operation: the old path
            # re-read (and re-CRC'd) a source file's ENTIRE bank group for
            # every block it contributed — an N-block file cost N full
            # group reads, ~40% of merge wall at reference scale. Bounded
            # FIFO (groups cap at max_files_to_merge files, but bank sizes
            # are data-dependent).
            bank_cache: dict[tuple[bytes, int], np.ndarray] = {}
            bank_cache_bytes = 0

            def bank_for(src: _SourceBlock) -> np.ndarray:
                nonlocal bank_cache_bytes
                key = (src.pointer, src.block.bank_group)
                bank = bank_cache.get(key)
                if bank is None:
                    group_meta = src.metadata.bank_groups[src.block.bank_group]
                    bank = read_bank_group(fh_for(src.pointer), group_meta)
                    while (
                        bank_cache
                        and bank_cache_bytes + bank.nbytes
                        > _MERGE_BANK_CACHE_BYTES
                    ):
                        _, old = bank_cache.popitem()
                        bank_cache_bytes -= old.nbytes
                    bank_cache[key] = bank
                    bank_cache_bytes += bank.nbytes
                return bank

            try:
                for partition_id, blocks in by_partition.items():
                    self._process_partition_blocks(
                        writer, blocks, fh_for, bank_for, stats, rebuild_filters
                    )
            finally:
                for fh in open_files.values():
                    fh.close()
            writer.finish(file_filters)
            writer_fh.close()
        except Exception:
            try:
                if hasattr(writer_fh, "abort"):
                    writer_fh.abort()
                else:
                    writer_fh.close()
            except Exception:
                pass
            engine.data_store.tombstone_file(new_pointer)
            raise

        metadata = self._reread_metadata(new_pointer)
        if not self._may_publish():
            # Lease lost after writing the output: un-publish it (never
            # referenced by metadata, so tombstoning is safe) and stop.
            engine.data_store.tombstone_file(new_pointer)
            raise _MergeLeaseLost()
        # file_size lets metadata-backed stores report MaybeFile.size (merge
        # grouping sorts/caps on it; size 0 would re-merge forever).
        engine.meta_store.update(
            [WriteOperation(metadata, new_pointer, file_size=writer.bytes_written)],
            [DeleteOperation(mf.pointer) for mf in group],
        )
        for mf in group:
            engine._tombstone_or_defer(mf.pointer)
        stats.files_processed += len(group)

    def _reread_metadata(self, pointer: bytes) -> FileMetadata:
        from .file_format import read_file_metadata

        with self.engine.data_store.open_file(pointer) as fh:
            return read_file_metadata(fh)

    def _process_partition_blocks(
        self, writer, blocks, fh_for, bank_for, stats: MergeStats, rebuild_filters=None
    ) -> None:
        """Greedy grouping under caps, then copy or stream-merge

        (reference processPartitionBlocks, :1704-1760).
        """
        config = self.config
        remaining = list(blocks)
        while remaining:
            seed = remaining.pop(0)
            bucket = [seed]
            rows = seed.block.rows
            nbytes = seed.block.uncompressed_size
            i = 0
            while i < len(remaining):
                cand = remaining[i]
                if (
                    cand.block.partition_id == seed.block.partition_id
                    and cand.block.bloom_expected_items == seed.block.bloom_expected_items
                    and cand.block.bloom_false_positive_rate == seed.block.bloom_false_positive_rate
                    and cand.block.bloom_layout == seed.block.bloom_layout
                    and rows + cand.block.rows <= config.max_row_group_rows
                    and nbytes + cand.block.uncompressed_size <= config.max_row_group_bytes
                ):
                    bucket.append(remaining.pop(i))
                    rows += cand.block.rows
                    nbytes += cand.block.uncompressed_size
                else:
                    i += 1
            if len(bucket) == 1:
                self._copy_block(
                    writer, seed, fh_for, bank_for, stats, rebuild_filters
                )
            else:
                self._merge_blocks(
                    writer, bucket, fh_for, bank_for, stats, rebuild_filters
                )

    def _rebuild_add_rows(self, filters: BloomFilters, rows: list[bytes]) -> None:
        """Re-tokenize surviving rows into a fresh file-level filter triple.

        Same keyspace expansion as ingest (_IngestState._add_rows): the
        native batch tokenizer when the engine runs the default tokenizer,
        with the Python semantic spec for flagged (unicode) rows.
        """
        config = self.config
        native_result = None
        if (
            rows
            and config.tokenizer is basic_whitespace_lower_tokenizer
            and _native_ingest_available()
        ):
            native_result = _native_tokenize(rows, config.delimiter)
        if native_result is not None:
            field_h, token_h, ft_h, fallback_mask = native_result
            for hashes, selector in (
                (field_h, "field"),
                (token_h, "token"),
                (ft_h, "field_token"),
            ):
                if len(hashes):
                    getattr(filters, selector).add_hashes(hashes)
            flagged = [json.loads(r) for r, fb in zip(rows, fallback_mask) if fb]
        else:
            flagged = [json.loads(r) for r in rows]
        if not flagged:
            return
        field_keys: dict[str, None] = {}
        token_keys: dict[str, None] = {}
        ft_keys: dict[str, None] = {}
        for row in flagged:
            for path, values in unique_fields(row, config.delimiter).items():
                field_keys[path] = None
                for value in values:
                    for tok in config.tokenizer(value):
                        token_keys[tok] = None
                        ft_keys[make_field_token_key(path, tok)] = None
        for keys, selector in (
            (field_keys, "field"),
            (token_keys, "token"),
            (ft_keys, "field_token"),
        ):
            if keys:
                getattr(filters, selector).add_hashes(hash_keys(list(keys)))

    def _read_block_filters(self, src: _SourceBlock, bank_for) -> BloomFilters:
        group = src.metadata.bank_groups[src.block.bank_group]
        return extract_block_filters(bank_for(src), group, src.block.bank_col)

    def _copy_block(
        self, writer: DataFileWriter, src: _SourceBlock, fh_for, bank_for, stats, rebuild_filters=None
    ) -> None:
        """Raw byte copy; keeps original codec, params, minmax, timestamps

        (reference copyDataBlock, :1762-1786).
        """
        fh = fh_for(src.pointer)
        payload = read_block_rows_compressed(fh, src.block)
        filters = self._read_block_filters(src, bank_for)
        if rebuild_filters is not None:
            # Expiry dropped sibling blocks: the fresh file-level triple
            # needs this block's keys, which means decompressing what would
            # otherwise be a raw byte copy (the payload still raw-copies).
            data = decompress_block(
                payload, src.block.compression, src.block.uncompressed_size
            )
            self._rebuild_add_rows(
                rebuild_filters, split_rows(data, max_rows=max(src.block.rows, 1) * 2 + 16)
            )
        writer.add_block(
            payload,
            filters,
            rows=src.block.rows,
            partition_id=src.block.partition_id,
            min_max_indexes=src.block.min_max_indexes,
            compression=src.block.compression,
            uncompressed_size=src.block.uncompressed_size,
            created_at_ms=src.block.created_at_ms,
            params=src.block.bloom_params,
            rows_canonical=src.block.rows_canonical,
        )
        stats.row_groups_processed += 1
        stats.rows_processed += src.block.rows
        stats.bytes_processed += src.block.size

    def _merge_blocks(
        self, writer: DataFileWriter, bucket: list[_SourceBlock], fh_for, bank_for, stats, rebuild_filters=None
    ) -> None:
        """Stream-merge: OR filters, union minmax, round-robin interleave

        rows, re-compress to the engine's codec (reference mergeDataBlocks +
        streamMergeDataBlocks, :1789-1929). Heterogeneous source codecs
        consolidate to the current config codec.
        """
        config = self.config
        merged_filters: Optional[BloomFilters] = None
        min_max: dict[str, MinMaxIndex] = {}
        row_streams: list[list[bytes]] = []
        total_rows = 0
        created_at = 0
        for src in bucket:
            fh = fh_for(src.pointer)
            filters = self._read_block_filters(src, bank_for)
            if merged_filters is None:
                merged_filters = filters
            else:
                merged_filters.merge(filters)
            min_max = union_min_max_indexes(min_max, src.block.min_max_indexes)
            compressed = read_block_rows_compressed(fh, src.block)
            data = decompress_block(compressed, src.block.compression, src.block.uncompressed_size)
            rows = split_rows(data, max_rows=max(src.block.rows, 1) * 2 + 16)
            if rebuild_filters is not None:
                self._rebuild_add_rows(rebuild_filters, rows)
            row_streams.append(rows)
            total_rows += len(rows)
            # Newest source: merged data never expires earlier than it should.
            created_at = max(created_at, src.block.created_at_ms)
            stats.rows_processed += src.block.rows
            stats.bytes_processed += src.block.size
            stats.row_groups_processed += 1

        encoder = StreamEncoder(config.row_data_compression, config.zstd_compression_level)
        # Round-robin one row per source per pass (reference :1846-1894),
        # batched into large encoder writes (per-row compressor calls
        # dominate merge profiles the same way they did ingest).
        cursors = [0] * len(row_streams)
        remaining = total_rows
        parts: list[bytes] = []
        while remaining:
            for si, rows in enumerate(row_streams):
                if cursors[si] < len(rows):
                    parts.append(encode_row(rows[cursors[si]]))
                    cursors[si] += 1
                    remaining -= 1
            if len(parts) >= 4096:
                encoder.write(b"".join(parts))
                parts.clear()
        if parts:
            encoder.write(b"".join(parts))
        payload = encoder.finish()

        writer.add_block(
            payload,
            merged_filters,
            rows=total_rows,
            partition_id=bucket[0].block.partition_id,
            min_max_indexes=min_max,
            compression=config.row_data_compression,
            uncompressed_size=encoder.uncompressed_len,
            created_at_ms=created_at,
            # Stamp the params the OR'd filter actually has (sources share
            # them by the mergeability gate).
            params=bucket[0].block.bloom_params,
            # Merged rows copy source bytes verbatim: canonical only when
            # EVERY source block was.
            rows_canonical=all(s.block.rows_canonical for s in bucket),
        )


class _IngestState:
    """All mutable buffer state, owned by the single ingest actor thread

    (the reference's lock-free single-writer design, :354-360; README.md:
    336-339). Never touched from any other thread.
    """

    def __init__(self, engine: BloomSearchEngine):
        self.engine = engine
        self.config = engine.config
        self.partition_buffers: dict[str, _PartitionBuffer] = {}
        self.done_futures: list[Optional[Future]] = []
        self.buffered_row_count = 0
        self.buffered_bytes = 0
        self.buffer_start_time: Optional[float] = None
        self.file_filters = BloomFilters.from_params(self.config.file_bloom_params)
        # Running keys/row estimate for block_bloom_expected_items="auto"
        # (batch-level dedup counts OVERestimate block-level distinct keys —
        # the conservative direction for filter sizing).
        self.keys_seen = 0
        self.rows_seen = 0

    def _record_keys(self, n_keys: int, n_rows: int) -> None:
        self.keys_seen += n_keys
        self.rows_seen += n_rows

    def _block_params_for_new_buffer(self) -> BloomParams:
        config = self.config
        if config.block_bloom_expected_items != "auto":
            return config.block_bloom_params
        if self.rows_seen < 500:
            return config.block_bloom_params  # cold start: reference sizing
        keys_per_row = self.keys_seen / self.rows_seen
        n = max(
            config.max_row_group_rows,
            int(keys_per_row * config.max_row_group_rows * 1.25) + 1,
        )
        return BloomParams(n, config.bloom_false_positive_rate, config.bloom_layout)

    def process(self, req: _IngestRequest) -> None:
        """(reference processIngestRequest :460-675)"""
        if req.force_flush:
            if self.buffered_row_count > 0:
                self.done_futures.append(req.done)
                self.flush_buffered()
            else:
                # Nothing buffered here — but an auto-triggered flush may
                # still be queued for the flush worker. Push an empty request
                # through the same FIFO as a durability barrier so Flush()
                # never acks before earlier flushes are durable (improves on
                # the reference, which acks immediately: :493-496).
                self.engine._flush_queue.put(_FlushRequest({}, [req.done], None))
            return
        try:
            if req.serialized:
                self._ingest_serialized_rows(req.rows, req.partition_id)
            else:
                self._ingest_rows(req.rows)
        except Exception as exc:
            _resolve([req.done], exc)
            return
        self.done_futures.append(req.done)
        self._check_flush_triggers()

    def _ingest_rows(self, rows: list[dict]) -> None:
        config = self.config
        # Normalize FIRST: an iterator input would read truthy even when
        # empty (and be consumed by the partition loop before a tail
        # check), re-creating the junk 0-row-block bug the guard exists to
        # prevent. ingest_rows([]) must not create an empty partition
        # buffer nor start the time-flush clock.
        rows = list(rows)
        if not rows:
            return
        # Group rows by partition (reference :500-509).
        partitioned: dict[str, list[dict]] = {}
        if config.partition_func is not None:
            for row in rows:
                partitioned.setdefault(config.partition_func(row), []).append(row)
        else:
            partitioned[""] = rows

        if self.buffer_start_time is None:
            self.buffer_start_time = time.monotonic()

        use_native_tokenizer = (
            config.tokenizer is basic_whitespace_lower_tokenizer
            and len(config.delimiter) == 1
            and 0x21 <= ord(config.delimiter) <= 0x7E
            and _native_ingest_available()
        )

        for partition_id, partition_rows in partitioned.items():
            buf = self.partition_buffers.get(partition_id)
            if buf is None:
                buf = _PartitionBuffer(
                    partition_id,
                    self._block_params_for_new_buffer(),
                    config.row_data_compression,
                    config.zstd_compression_level,
                )
                self.partition_buffers[partition_id] = buf

            # Minmax updates need the parsed dicts (:567-584).
            for index_field in config.min_max_indexes:
                for row in partition_rows:
                    if index_field in row:
                        bounds = convert_to_min_max_int64(row[index_field])
                        if bounds is None:
                            continue
                        existing = buf.min_max_indexes.get(index_field)
                        if existing is None:
                            buf.min_max_indexes[index_field] = MinMaxIndex(*bounds)
                        else:
                            buf.min_max_indexes[index_field] = update_min_max_index(
                                existing, *bounds
                            )

            # Serialize rows and feed the compressor (:567-613) — the whole
            # batch lands in ONE native call and ONE compressor write when
            # the C++ serializer is available (bloomsearch_pyser.cpp; it
            # falls back to None on any content it can't render exactly).
            stream: Optional[bytes] = None
            offsets = lengths = None
            serialized: Optional[list[bytes]] = None
            if _native_ingest_available():
                from . import native as _native_mod

                native_ser = _native_mod.serialize_rows(partition_rows)
                if native_ser is not None:
                    stream, offsets, lengths = native_ser
            if stream is None:
                serialized = []
                stream_parts: list[bytes] = []
                dumps = json.dumps
                for row in partition_rows:
                    row_bytes = dumps(row, separators=(",", ":")).encode("utf-8")
                    if len(row_bytes) > MAX_ROW_BYTES:
                        raise ValueError(
                            f"row too large: {len(row_bytes)} bytes exceeds maximum"
                        )
                    serialized.append(row_bytes)
                    stream_parts.append(_LENGTH_PREFIX.pack(len(row_bytes)))
                    stream_parts.append(row_bytes)
                stream = b"".join(stream_parts)
            buf.encoder.write(stream)
            buf.row_count += len(partition_rows)
            self.buffered_row_count += len(partition_rows)
            self.buffered_bytes += len(stream)

            # Expand the three keyspaces and feed both block + file filters.
            # Hot path: the native tokenizer parses the serialized batch,
            # tokenizes, hashes, and dedupes in one C++ pass (replacing the
            # reference's per-key AddString loop :547-565); rows it flags
            # (unicode content) fall back to the Python semantic spec.
            fallback_rows = partition_rows
            if use_native_tokenizer and partition_rows:
                from . import native as _native_mod

                if offsets is not None:
                    native_result = _native_mod.ingest_tokenize(
                        stream, offsets, lengths, config.delimiter
                    )
                else:
                    native_result = _native_tokenize(serialized, config.delimiter)
                if native_result is not None:
                    field_h, token_h, ft_h, fallback_mask = native_result
                    self._record_keys(
                        len(field_h) + len(token_h) + len(ft_h), len(partition_rows)
                    )
                    for hashes, selector in (
                        (field_h, "field"),
                        (token_h, "token"),
                        (ft_h, "field_token"),
                    ):
                        if len(hashes):
                            getattr(buf.filters, selector).add_hashes(hashes)
                            getattr(self.file_filters, selector).add_hashes(hashes)
                    fallback_rows = [
                        row for row, fb in zip(partition_rows, fallback_mask) if fb
                    ]

            if fallback_rows:
                self._add_python_keys(buf, fallback_rows)

    def _add_python_keys(self, buf: _PartitionBuffer, rows) -> None:
        """Expand keyspaces via the Python semantic spec and add to filters."""
        config = self.config
        field_keys: dict[str, None] = {}
        token_keys: dict[str, None] = {}
        ft_keys: dict[str, None] = {}
        for row in rows:
            fields = unique_fields(row, config.delimiter)
            for path, values in fields.items():
                field_keys[path] = None
                for value in values:
                    for tok in config.tokenizer(value):
                        token_keys[tok] = None
                        ft_keys[make_field_token_key(path, tok)] = None
        self._record_keys(
            len(field_keys) + len(token_keys) + len(ft_keys), len(rows)
        )
        for keys, selector in (
            (field_keys, "field"),
            (token_keys, "token"),
            (ft_keys, "field_token"),
        ):
            if keys:
                hashes = hash_keys(list(keys))
                getattr(buf.filters, selector).add_hashes(hashes)
                getattr(self.file_filters, selector).add_hashes(hashes)

    def _ingest_serialized_rows(
        self, serialized: list[bytes], partition_id: str = ""
    ) -> None:
        """Pre-serialized fast lane: no dict round-trip, explicit partition."""
        config = self.config
        serialized = list(serialized)  # iterator inputs read truthy when empty
        if not serialized:
            return  # no empty buffer / junk 0-row block (see _ingest_rows)
        if self.buffer_start_time is None:
            self.buffer_start_time = time.monotonic()
        buf = self.partition_buffers.get(partition_id)
        if buf is None:
            buf = _PartitionBuffer(
                partition_id,
                self._block_params_for_new_buffer(),
                config.row_data_compression,
                config.zstd_compression_level,
            )
            self.partition_buffers[partition_id] = buf

        # Verbatim bytes: number spellings may diverge from their tokens
        # (e.g. "1e5" vs token "100000") — the block must record that the
        # scan pre-filter can't prune numeric tokens against it.
        buf.rows_canonical = False

        stream_parts: list[bytes] = []
        batch_bytes = 0
        for row_bytes in serialized:
            if len(row_bytes) > MAX_ROW_BYTES:
                raise ValueError(f"row too large: {len(row_bytes)} bytes exceeds maximum")
            stream_parts.append(_LENGTH_PREFIX.pack(len(row_bytes)))
            stream_parts.append(row_bytes)
            batch_bytes += len(row_bytes) + 4
        buf.encoder.write(b"".join(stream_parts))
        buf.row_count += len(serialized)
        self.buffered_row_count += len(serialized)
        self.buffered_bytes += batch_bytes

        # Shared byte-level view of the batch for the native tokenizer and
        # the minmax extractor (one join, two passes) — built only when at
        # least one of those consumers will actually run: a custom tokenizer
        # with no minmax indexes would otherwise pay a batch-sized memcpy
        # per call for data nothing reads.
        joined = joined_offsets = joined_lengths = None
        if (
            serialized
            and _native_ingest_available()
            and (
                config.min_max_indexes
                or config.tokenizer is basic_whitespace_lower_tokenizer
            )
        ):
            joined_lengths = np.fromiter(
                (len(b) for b in serialized), dtype=np.int64, count=len(serialized)
            )
            joined_offsets = np.zeros(len(serialized), dtype=np.int64)
            if len(serialized) > 1:
                np.cumsum(joined_lengths[:-1], out=joined_offsets[1:])
            joined = b"".join(serialized)

        if config.min_max_indexes and serialized:
            self._update_minmax_serialized(
                buf, serialized, joined, joined_offsets, joined_lengths
            )

        native_result = None
        if (
            config.tokenizer is basic_whitespace_lower_tokenizer
            and joined is not None
        ):
            from . import native as _native_mod

            native_result = _native_mod.ingest_tokenize(
                joined, joined_offsets, joined_lengths, config.delimiter
            )
        if native_result is not None:
            field_h, token_h, ft_h, fallback_mask = native_result
            self._record_keys(
                len(field_h) + len(token_h) + len(ft_h), len(serialized)
            )
            for hashes, selector in (
                (field_h, "field"),
                (token_h, "token"),
                (ft_h, "field_token"),
            ):
                if len(hashes):
                    getattr(buf.filters, selector).add_hashes(hashes)
                    getattr(self.file_filters, selector).add_hashes(hashes)
            flagged = [
                json.loads(row) for row, fb in zip(serialized, fallback_mask) if fb
            ]
        else:
            flagged = [json.loads(row) for row in serialized]
        if flagged:
            self._add_python_keys(buf, flagged)

    def _update_minmax_serialized(
        self, buf: _PartitionBuffer, serialized, joined, joined_offsets, joined_lengths
    ) -> None:
        """Fast-lane minmax: byte-level extraction with per-row Python
        fallback (VERDICT r3 item 9). Bounds must cover actual values —
        a missed value would let prefiltering exclude a matching block
        (false negative) — so uncertain rows always parse via the spec."""
        config = self.config
        parsed_rows: dict[int, Any] = {}

        def parsed(i: int):
            if i not in parsed_rows:
                parsed_rows[i] = json.loads(serialized[i])
            return parsed_rows[i]

        for index_field in config.min_max_indexes:
            res = None
            if joined is not None:
                from . import native as _native_mod

                res = _native_mod.extract_minmax(
                    joined, joined_offsets, joined_lengths, index_field
                )
            int64_min_max = None
            fallback_idx: Any = range(len(serialized))
            if res is not None:
                lo_arr, hi_arr, status = res
                found = status == 1
                if found.any():
                    int64_min_max = (
                        int(lo_arr[found].min()),
                        int(hi_arr[found].max()),
                    )
                fallback_idx = np.nonzero(status == 2)[0]
            for i in fallback_idx:
                row = parsed(int(i))
                if not isinstance(row, dict) or index_field not in row:
                    continue
                bounds = convert_to_min_max_int64(row[index_field])
                if bounds is None:
                    continue
                if int64_min_max is None:
                    int64_min_max = bounds
                else:
                    int64_min_max = (
                        min(int64_min_max[0], bounds[0]),
                        max(int64_min_max[1], bounds[1]),
                    )
            if int64_min_max is None:
                continue
            existing = buf.min_max_indexes.get(index_field)
            if existing is None:
                buf.min_max_indexes[index_field] = MinMaxIndex(*int64_min_max)
            else:
                buf.min_max_indexes[index_field] = update_min_max_index(
                    existing, *int64_min_max
                )

    def _check_flush_triggers(self) -> None:
        """(reference :616-650) — partition caps, then buffer caps."""
        config = self.config
        should_flush = False
        for buf in self.partition_buffers.values():
            if buf.row_count >= config.max_row_group_rows:
                logger.info(
                    "FLUSH TRIGGER: partition %r hit max rows (%d >= %d)",
                    buf.partition_id, buf.row_count, config.max_row_group_rows,
                )
                should_flush = True
                break
            if buf.uncompressed_size >= config.max_row_group_bytes:
                logger.info(
                    "FLUSH TRIGGER: partition %r hit max bytes (%d >= %d)",
                    buf.partition_id, buf.uncompressed_size, config.max_row_group_bytes,
                )
                should_flush = True
                break
        if not should_flush:
            if self.buffered_row_count >= config.max_buffered_rows:
                logger.info(
                    "FLUSH TRIGGER: buffer hit max rows (%d >= %d)",
                    self.buffered_row_count, config.max_buffered_rows,
                )
                should_flush = True
            elif self.buffered_bytes >= config.max_buffered_bytes:
                logger.info(
                    "FLUSH TRIGGER: buffer hit max bytes (%d >= %d)",
                    self.buffered_bytes, config.max_buffered_bytes,
                )
                should_flush = True
            elif (
                self.buffer_start_time is not None
                and time.monotonic() - self.buffer_start_time >= config.max_buffered_time
            ):
                logger.info("FLUSH TRIGGER: buffer hit max time")
                should_flush = True
        if should_flush:
            self.flush_buffered()

    def maybe_time_flush(self) -> None:
        """(reference ticker branch :398-412)"""
        if (
            self.buffered_row_count > 0
            and self.buffer_start_time is not None
            and time.monotonic() - self.buffer_start_time >= self.config.max_buffered_time
        ):
            self.flush_buffered()

    def flush_buffered(self) -> None:
        """Hand the buffers to the flush worker and reset (reference :416-458).

        File-level filters accumulate across the whole buffer epoch and reset
        after each flush — the flush-race invariant regression-tested by the
        reference (bloom_tree_engine_test.go:2183-2311) holds by construction
        here because this thread owns all the state.
        """
        if not self.partition_buffers:
            _resolve(self.done_futures, None)
            self.done_futures = []
            return
        flush_req = _FlushRequest(
            self.partition_buffers, self.done_futures, self.file_filters
        )
        self.partition_buffers = {}
        self.done_futures = []
        self.buffered_row_count = 0
        self.buffered_bytes = 0
        self.buffer_start_time = None
        self.file_filters = BloomFilters.from_params(self.config.file_bloom_params)
        self.engine._trigger_flush(flush_req)
