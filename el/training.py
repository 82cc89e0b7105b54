"""Offline training-data construction.

Mirrors MentionPairTrainingData.scala:34-53: labeled mention pairs with
the negative class downsampled to NEG_RATIO:1 against the positives and
an overall cap. The reference samples with a fixed RNG seed (seed 0);
our analog RANKS pairs by the md5 of their id pair and keeps the
smallest — the same uniform pseudo-random selection, but order-free,
partition-free, resumable, and expressible in ANSI SQL (the driver
oracle replays it exactly with DuckDB's md5)."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

NEG_RATIO = 10  # MentionPairTrainingData.scala:45-53
PAIR_CAP = 3000


def _with_hash(t: pa.Table) -> pa.Table:
    h = [
        hashlib.md5(f"{a}:{b}".encode()).hexdigest()
        for a, b in zip(t.column("m1_id").to_pylist(),
                        t.column("m2_id").to_pylist())
    ]
    return t.append_column("h", pa.array(h, pa.string()))


def build_pair_training_set(gold_pairs_ds,
                            neg_ratio: int = NEG_RATIO, cap: int = PAIR_CAP):
    """gold_pairs (m1_id, m2_id, block_key, same_entity) -> training
    sample: all (capped) positives plus hash-rank-downsampled negatives
    at neg_ratio:1."""
    withh = gold_pairs_ds.map_batches(_with_hash, batch_format="pyarrow")
    pos = withh.map_batches(
        lambda t: t.filter(t.column("same_entity")), batch_format="pyarrow"
    )
    neg = withh.map_batches(
        lambda t: t.filter(pc.invert(t.column("same_entity"))),
        batch_format="pyarrow",
    )
    n_pos = min(pos.count(), max(1, cap // (neg_ratio + 1)))
    n_neg = min(neg.count(), n_pos * neg_ratio)
    from .shuffle import arrowize

    out = arrowize(pos).sort("h").limit(n_pos).union(
        arrowize(neg).sort("h").limit(n_neg))
    return out.map_batches(lambda t: t.drop_columns(["h"]),
                           batch_format="pyarrow")
