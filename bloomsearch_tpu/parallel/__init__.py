from .mesh import (
    BLOCK_AXIS,
    default_mesh,
    pad_columns_for_mesh,
    shard_bank,
    sharded_probe_packed,
    sharded_query_step,
    unpack_bitmap,
)
from .distributed import QueryPeer, ScatterGatherCoordinator
from .remote import QueryServer, RemoteQueryPeer
from .discovery import (
    CapacityScatterCoordinator,
    Heartbeat,
    PeerInfo,
    PeerRegistry,
    assign_files_by_capacity,
)

__all__ = [
    "BLOCK_AXIS",
    "default_mesh",
    "pad_columns_for_mesh",
    "shard_bank",
    "sharded_probe_packed",
    "sharded_query_step",
    "unpack_bitmap",
    "QueryPeer",
    "ScatterGatherCoordinator",
    "QueryServer",
    "RemoteQueryPeer",
    "CapacityScatterCoordinator",
    "Heartbeat",
    "PeerInfo",
    "PeerRegistry",
    "assign_files_by_capacity",
]
