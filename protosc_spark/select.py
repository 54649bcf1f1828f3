"""Driver-side feature-selection logic — semantics-exact re-derivation
of the reference's filter pipeline (protosc/model/utils.py:138-210 and
protosc/model/final_selection.py:5-40).

Inputs here are tiny (one H statistic per feature, one correlation
matrix over the surviving features), so this layer runs on the driver;
all heavy lifting happened in stats.py. Keeping the greedy quirks of
the reference (single-pass link walk in row-major order, cluster
expansion overshoot by one cluster) is deliberate: they are part of
the parity contract pinned by the fold-model tests.
"""

from __future__ import annotations

import numpy as np

from protosc_spark.numerics import correlation_pvalues

R2_THRESHOLD = 0.5
PVAL_THRESHOLD = 0.01
DROP_WORST_FRACTION = 0.05
CHISQ_CUMSUM_THRESHOLD = 0.25


def greedy_correlation_clusters(
    features_sorted: np.ndarray, r_matrix: np.ndarray, n_samples: int
) -> list[list[int]]:
    """Cluster features whose pairwise r^2 >= 0.5 with p < 0.01.

    Single forward pass over the significant upper-triangle links in
    row-major order, exactly like the reference (protosc/model/
    utils.py:138-172): a link is consumed only if neither endpoint was
    already absorbed; a new source index closes the current cluster.
    Unlinked features become singletons, in sorted order.
    """
    iu, ju = np.where(np.triu(r_matrix, 1) ** 2 >= R2_THRESHOLD)
    if len(iu):
        pvals = correlation_pvalues(r_matrix[iu, ju], n_samples)
        keep = pvals < PVAL_THRESHOLD
        iu, ju = iu[keep], ju[keep]
    if len(iu) == 0:
        return [[int(f)] for f in features_sorted]

    absorbed = np.zeros(len(features_sorted), dtype=bool)
    clusters: list[list[int]] = []
    src = iu[0]
    cur = [int(features_sorted[src])]
    for a, b in zip(iu, ju):
        if absorbed[a] or absorbed[b]:
            continue
        if a != src:
            absorbed[src] = True
            clusters.append(cur)
            src = a
            cur = [int(features_sorted[src])]
        cur.append(int(features_sorted[b]))
        absorbed[b] = True
    clusters.append(cur)

    clustered = {f for c in clusters for f in c}
    for f in features_sorted:
        if int(f) not in clustered:
            clusters.append([int(f)])
    return clusters


def select_from_stats(
    chisquare: np.ndarray,
    corr_of_sorted: "callable",
    n_samples: int,
    chisq_threshold: float = CHISQ_CUMSUM_THRESHOLD,
) -> tuple[list[int], list[list[int]]]:
    """The filter selection given per-feature H statistics.

    ``corr_of_sorted(features_sorted) -> r_matrix`` lets the caller
    supply either the distributed correlation (stats.correlation_
    submatrix) or a local np.corrcoef — both paths produce identical
    selections (pinned in tests).

    Steps mirror reference select_features (protosc/model/utils.py:
    175-210): sort H desc, drop the worst 5%, cluster, take the
    smallest prefix reaching 25% of the H cumsum, then emit whole
    clusters until the count exceeds that prefix length.
    """
    features_sorted = np.argsort(-chisquare)
    features_sorted = features_sorted[: int(len(features_sorted) * (1 - DROP_WORST_FRACTION))]
    chisq_sorted = chisquare[features_sorted]

    r_matrix = corr_of_sorted(features_sorted)
    clusters = greedy_correlation_clusters(features_sorted, r_matrix, n_samples)

    cumsum = chisq_sorted.cumsum()
    n_selected = int(np.argmax(cumsum / cumsum[-1] >= chisq_threshold)) + 1
    prefix = features_sorted[:n_selected]

    final: list[int] = []
    for cluster in clusters:
        if len(final) > len(prefix):
            break
        final.extend(cluster)
    return final, clusters


def final_feature_selection(
    fold_results: list[dict], null_distributions: list[list[float]]
) -> list[int]:
    """Cross-fold significance filter — reference final_selection
    (protosc/model/final_selection.py:5-40) re-derived.

    A fold is significant if its accuracy beats the 99th percentile of
    its null distribution; a feature is kept if it appears in at least
    one significant fold AND its summed accuracy over the folds that
    contain it beats every one of the 100 resampled null sums.
    """
    per_feature: dict[int, tuple[float, list[int]]] = {}
    significant_folds: set[int] = set()
    null_p99 = [np.quantile(nd, 0.99) for nd in null_distributions]

    for i_fold, res in enumerate(fold_results):
        for fid in res["features"]:
            acc_sum, folds = per_feature.get(fid, (0.0, []))
            per_feature[fid] = (acc_sum + res["accuracy"], folds + [i_fold])
        if res["accuracy"] > null_p99[i_fold]:
            significant_folds.add(i_fold)

    selected = []
    for fid, (acc_sum, folds) in per_feature.items():
        if not significant_folds.intersection(folds):
            continue
        null_sums = [
            sum(null_distributions[i_fold][i_res] for i_fold in folds)
            for i_res in range(100)
        ]
        if max(null_sums) < acc_sum:
            selected.append(fid)
    return selected
