"""Device prefetcher: overlap host batch assembly + H2D transfer with the
running step (the reference relies on torch DataLoader worker prefetch;
here the handoff to device is also pipelined)."""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator

import jax


def device_prefetch(
    iterable: Iterable[Any],
    size: int = 2,
    sharding: Any | None = None,
    put_fn: Any | None = None,
) -> Iterator[Any]:
    """Wrap a host batch iterator; batches are device_put in a background
    thread `size` steps ahead. With a NamedSharding, batches land already
    sharded over the mesh. ``put_fn`` overrides the transfer (e.g.
    ``parallel.mesh.shard_host_local_batch`` for multi-process training)."""

    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()
    _ERR = object()

    def put(batch):
        if put_fn is not None:
            return put_fn(batch)
        if sharding is None:
            return jax.tree_util.tree_map(jax.device_put, batch)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)

    def worker():
        # exceptions cross the thread boundary: a loader/transfer failure must
        # surface in the training loop, not silently end the epoch early
        try:
            for batch in iterable:
                q.put(put(batch))
        except BaseException as exc:  # noqa: BLE001 - re-raised in consumer
            q.put((_ERR, exc))
        else:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
            raise item[1]
        yield item
