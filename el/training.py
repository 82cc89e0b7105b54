"""Offline training-data construction (the only place seeded randomness
is allowed in the engine).

Mirrors MentionPairTrainingData.scala:34-53: labeled mention pairs with
the negative class downsampled to NEG_RATIO:1 against the positives and
an overall cap, under a fixed RNG seed (the reference uses seed 0) —
via Dataset.random_shuffle(seed)/limit so the sample is reproducible.
"""

from __future__ import annotations

import pyarrow.compute as pc

NEG_RATIO = 10  # MentionPairTrainingData.scala:45-53
PAIR_CAP = 3000


def build_pair_training_set(gold_pairs_ds, seed: int = 0,
                            neg_ratio: int = NEG_RATIO, cap: int = PAIR_CAP):
    """gold_pairs (m1_id, m2_id, block_key, same_entity) -> training
    sample with all (capped) positives and seeded-downsampled negatives."""
    pos = gold_pairs_ds.map_batches(
        lambda t: t.filter(t.column("same_entity")), batch_format="pyarrow"
    )
    neg = gold_pairs_ds.map_batches(
        lambda t: t.filter(pc.invert(t.column("same_entity"))),
        batch_format="pyarrow",
    )
    n_pos = min(pos.count(), max(1, cap // (neg_ratio + 1)))
    n_neg = min(neg.count(), n_pos * neg_ratio)
    pos_s = pos.random_shuffle(seed=seed).limit(n_pos)
    neg_s = neg.random_shuffle(seed=seed + 1).limit(n_neg)
    return pos_s.union(neg_s)
