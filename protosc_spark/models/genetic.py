"""Genetic feature-selection model (reference protosc/model/genetic.py:13-495).

Semantics re-derived, not ported: the GA evolves chromosomes (feature
subsets) whose fitness is k-fold classifier accuracy minus a
feature-count penalty; every evaluated (subset, accuracy) pair is kept;
after the final generation an ElasticNet is fitted on the binary
subset-membership matrix vs accuracy, with the regularization alpha
auto-tuned until 45-60%% of appended random PROBE columns get a zero
coefficient (protosc/model/genetic.py:439-460); real features whose
coefficient exceeds ``-ppf(criterion/n_real)·σ(probe coefs)`` are
selected (protosc/model/genetic.py:463-495).

Differences from the reference, by design:

* **Determinism**: the reference draws from the GLOBAL numpy RNG
  everywhere (irreproducible under its process pool); we thread one
  ``np.random.Generator`` through evolution and derive per-evaluation
  fold seeds from ``(seed, generation, chromosome, repeat)`` via
  ``SeedSequence`` — same results at any parallelism (the property the
  reference itself pins for fold models in tests/test_parallel.py).
* **Distribution**: fitness evaluations — the only heavy part — fan
  out as one Spark job per generation over the broadcast (X, y)
  submatrix (the reference uses its multiprocessing pool,
  protosc/parallel.py:5-108). Evolution, ElasticNet, and thresholding
  are tiny driver-side math (n_results × n_features binary matrix).
* The classifier is the engine-wide deterministic ridge stand-in
  (numerics.linear_classifier_accuracy) and ElasticNet is our
  coordinate-descent implementation (sklearn is unavailable).
"""

from __future__ import annotations

from math import ceil

import numpy as np

from protosc_spark.folds import balanced_fold_assignment
from protosc_spark.numerics import (
    elastic_net_coefs,
    linear_classifier_accuracy,
    norm_ppf,
)

# ---------------------------------------------------------------------------
# chromosome operations (pure functions over sets, explicit rng)
# ---------------------------------------------------------------------------


def random_chromosome(n_total: int, n_start: int, rng: np.random.Generator) -> set:
    return set(rng.choice(n_total, size=n_start, replace=False).tolist())


def crossover(c1: set, c2: set, rng: np.random.Generator) -> tuple[set, set]:
    """Two children; common features always inherited by both, unique
    features of each parent split half/half between the children
    (protosc/model/genetic.py:143-192)."""
    common = c1 & c2
    child_a, child_b = set(common), set(common)
    for uniq, take in ((c1 - common, len(c1 - common) // 2),
                       (c2 - common, (len(c2 - common) + 1) // 2)):
        picked = set(
            rng.choice(sorted(uniq), size=take, replace=False).tolist()
        ) if take else set()
        child_a |= picked
        child_b |= uniq - picked
    return child_a, child_b


def mutate(c: set, n_total: int, rate: float, rng: np.random.Generator) -> None:
    """In-place mutation; three kinds with the reference's mixture
    (protosc/model/genetic.py:194-248): 10%% split-off-a-third, else
    add-vs-remove balanced around the current fill fraction."""
    n_mutate = int(len(c) * rate)
    if len(c) * rate - n_mutate > rng.random():
        n_mutate += 1
    for _ in range(n_mutate):
        u = rng.random()
        if u < 0.1:
            _mutate_split(c, rng)
        elif (u - 0.1) / 0.9 > len(c) / n_total:
            _mutate_add(c, n_total, rng)
        else:
            _mutate_remove(c, rng)


def _mutate_add(c: set, n_total: int, rng: np.random.Generator) -> None:
    free = np.setdiff1d(np.arange(n_total), sorted(c))
    if len(free):
        c.add(int(rng.choice(free)))


def _mutate_remove(c: set, rng: np.random.Generator) -> None:
    if len(c) > 1:
        c.discard(int(rng.choice(sorted(c))))


def _mutate_split(c: set, rng: np.random.Generator) -> None:
    n_remove = len(c) // 3
    if n_remove <= 1:
        _mutate_remove(c, rng)
        return
    for f in rng.choice(sorted(c), size=n_remove, replace=False).tolist():
        c.discard(int(f))


# ---------------------------------------------------------------------------
# fitness (runs on executors)
# ---------------------------------------------------------------------------


def chromosome_accuracy(
    X: np.ndarray,
    y: np.ndarray,
    features: list[int],
    seeds: list,
    k: int = 8,
) -> float:
    """Mean k-fold accuracy over len(seeds) repeats with re-drawn folds
    (reference n_compute=2, protosc/model/genetic.py:419-420)."""
    if not features:
        return 0.0
    Xs = X[:, features]
    accs = []
    for s in seeds:
        fold_id = balanced_fold_assignment(y, k=k, rng=np.random.default_rng(s))
        for i in range(k):
            tr = (fold_id >= 0) & (fold_id != i)
            va = fold_id == i
            accs.append(
                linear_classifier_accuracy(Xs[tr], y[tr], Xs[va], y[va])
            )
    return float(np.mean(accs))


def _eval_job(job, bc_value):
    X, y, k = bc_value
    idx, features, seeds = job
    return idx, chromosome_accuracy(X, y, features, seeds, k=k)


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


def tune_elastic_net(
    results_X: np.ndarray, results_y: np.ndarray, n_random: int
) -> np.ndarray:
    """Fit ElasticNet, adjusting alpha until 45-60%% of the probe
    columns are zeroed (protosc/model/genetic.py:439-460)."""
    alpha, fac, last_dir = 2e-4, 2.0, -1
    probe_cols = np.arange(results_X.shape[1] - n_random, results_X.shape[1])
    lo, hi = round(n_random * 0.45), round(n_random * 0.6)
    coefs = np.zeros(results_X.shape[1])
    for _ in range(100):
        coefs = elastic_net_coefs(results_X, results_y, alpha=alpha)
        n_nz = int(np.sum(coefs[probe_cols] != 0))
        if n_nz > hi:
            if last_dir == 0:
                fac /= 2
            last_dir = 1
            alpha *= fac
        elif n_nz < lo:
            if last_dir == 1:
                fac /= 2
            last_dir = 0
            alpha /= fac
        else:
            break
    return coefs


def significant_features(
    coefs: np.ndarray, n_random: int, criterion: float = 0.5
) -> np.ndarray:
    """Probe-calibrated cutoff: keep real features whose coefficient
    exceeds ``-ppf(criterion/n_real)`` standard deviations of the
    nonzero probe coefficients (protosc/model/genetic.py:463-495)."""
    n_real = len(coefs) - n_random
    probe = coefs[n_real:]
    probe_nz = probe[probe != 0]
    sd = float(np.std(probe_nz)) if len(probe_nz) else 0.0
    limit = -norm_ppf(criterion / n_real) * sd
    return np.where(coefs[:n_real] > limit)[0]


class GeneticModel:
    """GA feature selection over a features DataFrame or numpy matrix."""

    def __init__(
        self,
        n_chromo: int = 100,
        mutation_rate: float = 0.1,
        k_tournament: int = 5,
        num_penalty: float = 0.005,
        n_gen_data: float = 3,
        n_random_features: int = 100,
        signif_criterion: float = 0.5,
        n_fold: int = 8,
        n_compute: int = 2,
    ):
        self.n_chromo = n_chromo
        self.mutation_rate = mutation_rate
        self.k_tournament = k_tournament
        self.num_penalty = num_penalty
        self.n_gen_data = n_gen_data
        self.n_random_features = n_random_features
        self.signif_criterion = signif_criterion
        self.n_fold = n_fold
        self.n_compute = n_compute
        self.interim: dict | None = None

    # -- driver/executor plumbing ------------------------------------------

    def _evaluate(self, spark, X, y, chromosomes, gen: int, seed: int):
        jobs = [
            (
                i,
                sorted(c),
                [
                    np.random.SeedSequence((seed, gen, i, r))
                    for r in range(self.n_compute)
                ],
            )
            for i, c in enumerate(chromosomes)
        ]
        if spark is None:
            pairs = [_eval_job(j, (X, y, self.n_fold)) for j in jobs]
        else:
            sc = spark.sparkContext
            bc = sc.broadcast((X, y, self.n_fold))
            n_slices = min(len(jobs), sc.defaultParallelism)
            pairs = (
                sc.parallelize(jobs, n_slices)
                .map(lambda j: _eval_job(j, bc.value))
                .collect()
            )
            bc.destroy()
        acc = np.zeros(len(chromosomes))
        for i, a in pairs:
            acc[i] = a
        return acc

    # -- main loop ----------------------------------------------------------

    def execute_matrix(
        self, X: np.ndarray, y: np.ndarray, seed: int = 0, spark=None
    ) -> np.ndarray:
        """GA over an in-memory matrix; returns selected real-feature ids."""
        rng = np.random.default_rng(seed)
        n_real = X.shape[1]
        probes = rng.standard_normal((X.shape[0], self.n_random_features))
        Xa = np.hstack([X, probes])
        n_total = Xa.shape[1]

        n_start = min(max(5, n_total // 10), n_total - 1)
        chromosomes = [
            random_chromosome(n_total, n_start, rng) for _ in range(self.n_chromo)
        ]
        n_gen = ceil(self.n_gen_data * n_total / self.n_chromo)

        results: list[tuple[list[int], float]] = []
        for gen in range(n_gen):
            acc = self._evaluate(spark, Xa, y, chromosomes, gen, seed)
            fitness = acc - self.num_penalty * np.array(
                [len(c) for c in chromosomes]
            )
            results.extend(
                (sorted(chromosomes[i]), float(acc[i]))
                for i in range(len(chromosomes))
                if acc[i] > 0
            )
            # tournament selection -> crossover -> mutation
            nxt: list[set] = []
            for _ in range(self.n_chromo // 2):
                parents: list[int] = []
                while len(parents) < 2:
                    # sample from the LIVE population: after generation
                    # 0 it has 2*(n_chromo//2) members, which is
                    # n_chromo-1 for odd n_chromo — indexing by
                    # range(n_chromo) would raise / skew selection
                    entrants = rng.choice(
                        len(chromosomes),
                        size=min(self.k_tournament, len(chromosomes)),
                        replace=False,
                    )
                    winner = int(entrants[np.argmax(fitness[entrants])])
                    if winner not in parents:
                        parents.append(winner)
                nxt.extend(
                    crossover(chromosomes[parents[0]], chromosomes[parents[1]], rng)
                )
            for c in nxt:
                mutate(c, n_total, self.mutation_rate, rng)
            chromosomes = nxt

        res_X = np.zeros((len(results), n_total))
        res_y = np.zeros(len(results))
        for i, (feats, a) in enumerate(results):
            res_X[i, feats] = 1.0
            res_y[i] = a
        coefs = tune_elastic_net(res_X, res_y, self.n_random_features)
        self.interim = {"coefs": coefs, "n_results": len(results)}
        return significant_features(
            coefs, self.n_random_features, self.signif_criterion
        )

    def execute(self, df, key_col: str = "sample_id", seed: int = 0) -> np.ndarray:
        """df: (key_col, features array<double>, y int). The GA needs
        every column's value for every sample (each generation touches
        arbitrary feature subsets), so the matrix is collected once —
        the reference holds it in memory by construction; at production
        scale GA selection runs on an aggregated/sampled matrix, never
        the raw turn table."""
        pdf = df.select(key_col, "features", "y").orderBy(key_col).toPandas()
        X = np.array(pdf["features"].tolist(), dtype=np.float64)
        y = pdf["y"].to_numpy()
        return self.execute_matrix(X, y, seed=seed, spark=df.sparkSession)
