"""Hash-partitioned grouping primitives.

Ray Data's sort-based ``groupby().aggregate()`` / ``map_groups`` costs
20-60s per call on high-cardinality keys at our bench scale (measured:
95k-group aggregate = 40s sort-based, 61s hash-aggregator-based), while
``repartition(n, keys=...)`` (hash exchange, ShuffleStrategy.HASH_SHUFFLE)
followed by a BLOCK-LOCAL vectorized aggregation runs the same job in
~2s. These helpers make that the engine's standard grouping idiom:

  group_blocks(ds, keys, block_fn)  — hash-partition on keys, then run
      ``block_fn`` once per co-located block (batch_size=None). The
      block fn sees every row of each key it sees (partition integrity
      is guaranteed by the exchange) and does the group logic in-process
      with pandas/pyarrow — no per-group Ray overhead.

  group_map(ds, key, group_fn)      — per-group function on single-key
      groups inside co-located blocks (replacement for
      groupby(key).map_groups(group_fn)).

This is also the right shape at 10^12 rows: one hash exchange per
grouping (the minimum any engine pays) and linear in-process combining;
hot keys are the caller's concern (salt/cap at pair generation).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def ensure_hash_shuffle() -> None:
    import ray.data
    from ray.data.context import ShuffleStrategy

    ctx = ray.data.DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE


def default_partitions() -> int:
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:  # noqa: BLE001 — before init, fall back
        cpus = 4
    # aggregator-actor startup scales with the partition count (~3s at 8,
    # ~8s at 32 measured); 16 keeps exchanges wide enough without paying
    # for a fleet of aggregators per exchange
    return min(16, max(4, cpus))


def _strip_block_meta(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def arrowize(ds):
    """Force blocks to metadata-free Arrow ahead of a shuffle op.

    Pandas blocks (and Arrow blocks carrying the ``pandas`` schema
    metadata dict) defeat Ray's schema deduplication — every block then
    ships its own schema through the exchange ("Failed to hash the
    schemas" in the aggregator/reduce logs). Zero-copy for clean Arrow
    blocks; the pandas->Arrow conversion happens in the map task that
    the shuffle would have paid for anyway."""
    return ds.map_batches(_strip_block_meta, batch_format="pyarrow",
                          batch_size=None)


def group_blocks(ds, keys: Sequence[str], block_fn: Callable, *,
                 num_partitions: int | None = None,
                 batch_format: str = "pyarrow", **kwargs):
    """Hash-partition by ``keys`` and apply ``block_fn`` to whole
    co-located blocks (all rows of any key end up in exactly one
    block)."""
    ensure_hash_shuffle()
    n = num_partitions or default_partitions()
    rp = arrowize(ds).repartition(n, keys=list(keys))
    return rp.map_batches(block_fn, batch_format=batch_format,
                          batch_size=None, **kwargs)


def split_groups(t: pa.Table, key: str):
    """Yield per-group sub-tables of a single block, grouped on one key
    (sorts the block, then slices runs) — in-process, no shuffle."""
    if t.num_rows == 0:
        return
    idx = pc.sort_indices(t, sort_keys=[(key, "ascending")])
    t = t.take(idx)
    arr = t.column(key).to_numpy(zero_copy_only=False)
    change = np.flatnonzero(arr[1:] != arr[:-1]) + 1
    starts = np.concatenate(([0], change, [len(arr)]))
    for s, e in zip(starts[:-1], starts[1:]):
        yield t.slice(s, e - s)


def group_map(ds, key: str, group_fn: Callable, *,
              num_partitions: int | None = None, **kwargs):
    """groupby(key).map_groups(group_fn) semantics over hash-partitioned
    blocks; ``group_fn``: pa.Table (one group) -> pa.Table."""

    def block_fn(t: pa.Table) -> pa.Table:
        outs = [group_fn(g) for g in split_groups(t, key)]
        outs = [o for o in outs if o is not None and o.num_rows >= 0]
        if not outs:
            return group_fn(t)  # empty block: let the fn emit its schema
        return pa.concat_tables(outs, promote_options="default")

    return group_blocks(ds, [key], block_fn,
                        num_partitions=num_partitions,
                        batch_format="pyarrow", **kwargs)


def _task_part_ids(tbl: pa.Table, keys: Sequence[str], n: int) -> np.ndarray:
    """Deterministic partition id per row (pandas siphash — stable
    across processes and runs, independent of Ray's exchange hash)."""
    import pandas as pd

    if len(keys) == 1:
        col = tbl.column(keys[0]).to_pandas().astype(str)
    else:
        col = tbl.select(list(keys)).to_pandas().astype(str).agg(
            "\x1f".join, axis=1)
    h = pd.util.hash_pandas_object(col, index=False).to_numpy()
    return (h % np.uint64(n)).astype(np.int64)


def _partition_one(tbl: pa.Table, keys: Sequence[str], n: int):
    """IN-TASK map phase of the task shuffle: split one table into n
    hash partitions (argsort + run slicing, one pass)."""
    if n == 1:
        return tbl
    if tbl.num_rows == 0:
        return tuple(tbl for _ in range(n))
    pid = _task_part_ids(tbl, keys, n)
    order = np.argsort(pid, kind="stable")
    t = tbl.take(pa.array(order))
    sp = pid[order]
    bounds = np.searchsorted(sp, np.arange(n + 1))
    return tuple(t.slice(int(bounds[p]), int(bounds[p + 1] - bounds[p]))
                 for p in range(n))


def _from_pandas_safe(df) -> pa.Table:
    """from_pandas that never emits NULL-typed columns: an empty object
    column (pandas' str dtype) otherwise converts to Arrow null type,
    which downstream string kernels (binary_join_element_wise, slice)
    reject."""
    t = pa.Table.from_pandas(df, preserve_index=False)
    if t.num_rows == 0 and any(pa.types.is_null(f.type)
                               for f in t.schema):
        return pa.table({
            f.name: pa.array([], pa.string() if pa.types.is_null(f.type)
                             else f.type)
            for f in t.schema
        })
    # drop the pandas metadata dict: it defeats Ray's schema
    # deduplication (unhashable), so every block ships its own schema
    return t.replace_schema_metadata(None)


def _reduce_partition(block_fn: Callable, batch_format: str, *tbls):
    """IN-TASK reduce phase: concat one partition's slices and run the
    block fn (same contract as group_blocks' per-block call)."""
    import pandas as pd

    tbls = [t for t in tbls if t is not None and t.num_rows]
    if not tbls:
        out = block_fn(pd.DataFrame() if batch_format == "pandas"
                       else pa.table({}))
    else:
        cols = tbls[0].column_names
        cat = pa.concat_tables([t.select(cols) for t in tbls],
                               promote_options="default")
        out = block_fn(cat.to_pandas() if batch_format == "pandas" else cat)
    if isinstance(out, pa.Table):
        return out
    return _from_pandas_safe(out)


def task_group_blocks(refs, keys: Sequence[str], block_fn: Callable, *,
                      num_partitions: int | None = None,
                      batch_format: str = "pandas"):
    """group_blocks semantics as a HAND-ROLLED shuffle of plain Ray
    tasks over materialized table refs: the same all-to-all data
    movement, WITHOUT the per-exchange aggregator-actor fleet a Ray
    Data hash repartition spins up (~3-8s startup each — fatal inside
    iterative loops, and the dominant fixed cost of the fallback
    plan's alias-scale exchanges, which move kilobytes).

    Returns a list of per-partition output table REFS (callers concat,
    from_arrow_refs, or feed the next shuffle). Tradeoff vs
    group_blocks: n_refs x num_partitions intermediate objects and no
    streaming backpressure — right for bounded alias-scale working
    sets, wrong for the mention-scale stages (those keep the Dataset
    exchange)."""
    import ray

    n = num_partitions or default_partitions()
    part = ray.remote(_partition_one).options(num_returns=n)
    cols = [part.remote(r, list(keys), n) for r in refs]
    cols = [[c] if n == 1 else list(c) for c in cols]
    red = ray.remote(_reduce_partition)
    return [
        red.remote(block_fn, batch_format, *[cols[i][p]
                                             for i in range(len(cols))])
        for p in range(n)
    ]


def _concat_refs_task(*tbls) -> pa.Table:
    tbls = [t for t in tbls if t is not None and t.num_rows]
    if not tbls:
        return pa.table({})
    cols = tbls[0].column_names
    return pa.concat_tables([t.select(cols) for t in tbls],
                            promote_options="default")


def bundle_refs(refs, max_bundles: int):
    """Coalesce many small table refs into <= max_bundles (one concat
    task per bundle). The task shuffle makes n_refs x num_partitions
    intermediate objects — bounded block counts keep that product sane
    when the input arrives as thousands of read-granularity blocks."""
    import ray

    refs = list(refs)
    if len(refs) <= max_bundles:
        return refs
    rem = ray.remote(_concat_refs_task)
    return [
        rem.remote(*(refs[i] for i in idx))
        for idx in np.array_split(np.arange(len(refs)), max_bundles)
        if len(idx)
    ]


def map_refs(refs, fn: Callable):
    """Plain-task map over table refs (skips nothing — fns guard empty
    input themselves); returns new refs."""
    import ray

    rem = ray.remote(_map_one)
    return [rem.remote(fn, r) for r in refs]


def _map_one(fn: Callable, tbl: pa.Table) -> pa.Table:
    if tbl.num_rows == 0:
        if not tbl.column_names:
            return tbl  # schema-less empty block: nothing to map, and
            # the fn would KeyError on its columns; shuffles skip empties
        if any(pa.types.is_null(f.type) for f in tbl.schema):
            # null-typed empty (pandas object-column artifact): string
            # kernels inside map fns reject null inputs
            tbl = pa.table({
                f.name: pa.array([], pa.string()
                                 if pa.types.is_null(f.type) else f.type)
                for f in tbl.schema
            })
    out = fn(tbl)
    if isinstance(out, pa.Table):
        return out
    return _from_pandas_safe(out)


def group_map_pandas(ds, key: str | Sequence[str], group_fn: Callable, *,
                     num_partitions: int | None = None, **kwargs):
    """Pandas flavor of group_map; ``group_fn``: DataFrame (one group)
    -> DataFrame."""
    import pandas as pd

    keys = [key] if isinstance(key, str) else list(key)

    def block_fn(df):
        if len(df) == 0:
            return group_fn(df)
        outs = [group_fn(g) for _, g in df.groupby(keys, sort=True)]
        outs = [o for o in outs if o is not None and len(o) >= 0]
        return pd.concat(outs, ignore_index=True) if outs else group_fn(df)

    return group_blocks(ds, keys, block_fn,
                        num_partitions=num_partitions,
                        batch_format="pandas", **kwargs)
