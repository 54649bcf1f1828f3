"""Deterministic balanced k-fold assignment with exact reference parity.

The reference's generator (protosc/feature_matrix.py:216-293):
per class (in np.unique order) shuffle indices with the fold rng,
subsample every class to the minimum class count, interleave classes
with stride = n_classes, then cut into k contiguous blocks (block i
gets n_blocks//k + (i < n_blocks % k) blocks).

Fold membership depends on numpy RNG state, so the assignment is
computed on the DRIVER over the collected (row_key, y) pairs — a few
bytes per sample; at 10^12-turn scale fold-based model selection runs
on a sampled/aggregated matrix anyway, never on the raw turn table.
The result is broadcast-joined back as a ``fold_id`` column (-1 =
dropped by balancing); per-fold train/val become column FILTERS, not
data copies (the reference materializes row copies per fold,
protosc/feature_matrix.py:290-292 — we don't).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def balanced_fold_assignment(
    y: np.ndarray, k: int = 8, rng: np.random.Generator | None = None,
    balance: bool = True,
) -> np.ndarray:
    """Return fold_id per positional sample (-1 = not in any fold).

    Exact re-derivation of the reference algorithm (see module doc):
    identical numpy RNG call sequence, so the same (y, seed) yields the
    same folds as the reference would produce.
    """
    if rng is None:
        rng = np.random.default_rng()
    y = np.asarray(y).reshape(-1)

    if balance:
        classes = np.unique(y)
        per_class = [np.where(y == c)[0] for c in classes]
        n_keep = min(len(ix) for ix in per_class)
        stride = len(classes)
        selection = np.zeros(n_keep * stride, dtype=int)
        for i, ix in enumerate(per_class):
            rng.shuffle(ix)
            chosen = ix if len(ix) == n_keep else rng.choice(
                ix, size=n_keep, replace=False
            )
            selection[i::stride] = chosen
    else:
        selection = rng.permutation(len(y))
        stride = 1

    n_blocks = len(selection) // stride
    fold_id = np.full(len(y), -1, dtype=int)
    cur_block = 0
    for i in range(k):
        n_new = n_blocks // k + int(i < (n_blocks % k))
        start, end = cur_block * stride, (cur_block + n_new) * stride
        fold_id[selection[start:end]] = i
        cur_block += n_new
    return fold_id


def with_fold_id(
    df: DataFrame,
    key_col: str,
    label_col: str = "y",
    k: int = 8,
    fold_seed: int | None = None,
    balance: bool = True,
) -> DataFrame:
    """Attach a ``fold_id`` column (-1 = excluded by class balancing).

    Rows are ordered by ``key_col`` before assignment so the positional
    semantics are stable regardless of physical layout.
    """
    keyed: pd.DataFrame = (
        df.select(key_col, label_col).orderBy(key_col).toPandas()
    )
    rng = np.random.default_rng(fold_seed)
    fold = balanced_fold_assignment(
        keyed[label_col].to_numpy(), k=k, rng=rng, balance=balance
    )
    assign = pd.DataFrame({key_col: keyed[key_col], "fold_id": fold.astype("int32")})
    spark = df.sparkSession
    return df.join(F.broadcast(spark.createDataFrame(assign)), key_col, "left")
