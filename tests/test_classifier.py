"""Trainable quality classifier: planted-vocabulary recovery,
determinism across partitioning, bounded driver traffic."""

import numpy as np
import pytest

from protosc_spark.classifier import (
    score_quality,
    train_quality_classifier,
)

NF = 1 << 12  # small hash space keeps the test fast; collisions fine


@pytest.fixture(scope="module")
def labeled(spark):
    """Positives use a 'clean' vocabulary, negatives a 'spammy' one,
    with shared filler words — linearly separable by construction."""
    rng = np.random.default_rng(99)
    clean = [f"clean{i}" for i in range(30)]
    spam = [f"spam{i}" for i in range(30)]
    filler = [f"word{i}" for i in range(50)]
    rows = []
    for d in range(400):
        y = d % 2
        vocab = clean if y else spam
        toks = list(rng.choice(vocab, 8)) + list(rng.choice(filler, 12))
        rng.shuffle(toks)
        rows.append((d, " ".join(toks), y))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_recovers_planted_separation(spark, labeled):
    w, b = train_quality_classifier(
        labeled, n_features=NF, n_iter=25, lr=2.0
    )
    scored = score_quality(labeled, w, b, n_features=NF)
    pdf = scored.select("label", "quality_prob").toPandas()
    pos = pdf[pdf.label == 1]["quality_prob"]
    neg = pdf[pdf.label == 0]["quality_prob"]
    # fully separable vocabularies: ~perfect training separation
    acc = ((pdf.quality_prob >= 0.5).astype(int) == pdf.label).mean()
    assert acc >= 0.98
    assert pos.mean() - neg.mean() > 0.3


def test_generalizes_to_held_out_docs(spark, labeled):
    """Train on even doc_ids, score the held-out odds: the planted
    vocabulary signal transfers (same vocab, unseen docs)."""
    from pyspark.sql import functions as F

    train = labeled.where(F.col("doc_id") % 4 < 2)
    test = labeled.where(F.col("doc_id") % 4 >= 2)
    w, b = train_quality_classifier(train, n_features=NF, n_iter=25)
    pdf = (
        score_quality(test, w, b, n_features=NF)
        .select("label", "quality_prob")
        .toPandas()
    )
    acc = ((pdf.quality_prob >= 0.5).astype(int) == pdf.label).mean()
    assert acc >= 0.95


def test_deterministic_across_partitioning(spark, labeled):
    w1, b1 = train_quality_classifier(labeled, n_features=NF, n_iter=5)
    w2, b2 = train_quality_classifier(
        labeled.repartition(13), n_features=NF, n_iter=5
    )
    # gradient is summed in float64 over per-partition partials; the
    # partial SUMS are permutation-sensitive at the ulp level, so pin
    # allclose + identical predictions, not bitwise weight equality
    assert np.allclose(w1, w2, atol=1e-12) and abs(b1 - b2) < 1e-12
    a = score_quality(labeled, w1, b1, n_features=NF).select("quality_prob")
    b = score_quality(labeled, w2, b2, n_features=NF).select("quality_prob")
    assert [r[0] for r in a.collect()] == [r[0] for r in b.collect()]


def test_empty_training_set_raises(spark, labeled):
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="empty"):
        train_quality_classifier(
            labeled.where(F.lit(False)), n_features=NF, n_iter=1
        )


# ------------------------------------------------------- naive bayes
class TestNaiveBayes:
    def _fit_predict(self, spark, train_rows, test_rows):
        from protosc_spark.classifier import nb_predict, nb_train

        tr = spark.createDataFrame(train_rows, "label string, text string")
        te = spark.createDataFrame(test_rows, "doc_id string, text string")
        lik, labels = nb_train(tr, "label")
        return {
            r["id"]: r for r in nb_predict(lik, labels, te).collect()
        }

    def test_hand_fixture_exact_units(self, spark):
        import math

        train = [
            ("spam", "buy pills now"),
            ("spam", "buy now"),
            ("ham", "meeting notes attached"),
        ]
        out = self._fit_predict(
            spark, train, [("d1", "buy pills"), ("d2", "meeting notes")]
        )
        assert out["d1"]["pred"] == "spam"
        assert out["d2"]["pred"] == "ham"
        # replay d1's spam score in exact units: V=6 distinct tokens
        # (buy pills now meeting notes attached), spam tot=5, counts
        # buy=2 pills=1; prior ln(2/3)
        u = 10**9
        lu = lambda c, tot: math.floor(math.log((c + 1) / (tot + 6)) * u)
        want = lu(2, 5) + lu(1, 5) + math.floor(math.log(2 / 3) * u)
        assert out["d1"]["score_u"] == want

    def test_prior_decides_unseen_tokens(self, spark):
        # every token unseen -> per-label default; class imbalance
        # (prior) must break the near-tie deterministically
        train = [("a", "x x x"), ("a", "x"), ("b", "y y y y")]
        out = self._fit_predict(spark, train, [("d", "zz qq")])
        # defaults: a tot=4 V=2 -> ln(1/6)*2 ; b tot=4 -> ln(1/6)*2 ;
        # priors ln(2/3) vs ln(1/3): 'a' wins on prior
        assert out["d"]["pred"] == "a"

    def test_tie_breaks_to_smallest_label(self, spark):
        train = [("a", "x"), ("b", "x")]
        out = self._fit_predict(spark, train, [("d", "x")])
        assert out["d"]["pred"] == "a"

    def test_parallelism_invariant(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from protosc_spark.classifier import nb_predict, nb_train

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        tr = docs.where(F.col("doc_id") % 7 < 2).select(
            F.col("source").alias("label"), "text"
        )
        te = docs.where(F.col("doc_id") % 7 == 6).select(
            "doc_id", "text"
        )
        outs = []
        for parts in (1, 13):
            lik, labels = nb_train(tr.repartition(parts), "label")
            outs.append(
                sorted(
                    map(
                        tuple,
                        nb_predict(
                            lik, labels, te.repartition(parts)
                        ).collect(),
                    )
                )
            )
        assert outs[0] == outs[1]
