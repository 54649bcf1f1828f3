"""Char-bigram LM quality scoring: engine vs DuckDB oracle, smoothing
semantics on hand-computed fixtures, plan shape."""

import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from protosc_spark.lm import lm_quality_filter, lm_score, train_char_bigram_lm

DOCS = "/root/testdata/sf0.001/documents.parquet"
K = 0.5


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    return con.execute(sql).df()


ORACLE = f"""
WITH bg AS (
  SELECT unnest(list_transform(range(1, length(text)),
                i -> substr(text, i::INT, 2))) AS bigram
  FROM documents
), cnt AS (
  SELECT bigram, count(*)::DOUBLE AS n FROM bg GROUP BY bigram
), tot AS (
  SELECT substr(bigram, 1, 1) AS c1, sum(n) AS n_c1 FROM cnt GROUP BY 1
), voc AS (
  SELECT count(DISTINCT ch)::DOUBLE AS v FROM (
    SELECT unnest(list_transform(range(1, length(text) + 1),
                  i -> substr(text, i::INT, 1))) AS ch
    FROM documents)
), doc_bg AS (
  SELECT doc_id, unnest(list_transform(range(1, length(text)),
                        i -> substr(text, i::INT, 2))) AS bigram
  FROM documents
), nll AS (
  SELECT doc_id,
         -coalesce(
            ln((cnt.n + {K}) / (tot.n_c1 + {K} * voc.v)),
            ln({K} / (tot.n_c1 + {K} * voc.v)),
            ln(1.0 / voc.v)) AS nll
  FROM doc_bg
  LEFT JOIN cnt USING (bigram)
  LEFT JOIN tot ON tot.c1 = substr(doc_bg.bigram, 1, 1)
  CROSS JOIN voc
)
SELECT doc_id, round(avg(nll), 6) AS avg_nll,
       round(exp(avg(nll)), 4) AS ppl,
       count(*)::BIGINT AS n_bigrams
FROM nll GROUP BY doc_id ORDER BY doc_id
"""


def test_lm_score_vs_duckdb(docs):
    lm = train_char_bigram_lm(docs, k=K)
    got = lm_score(docs, lm, k=K).orderBy("doc_id").toPandas()
    want = _duck(ORACLE)
    pd.testing.assert_frame_equal(got, want)


def test_lm_smoothing_hand_computed(spark):
    """Tiny corpus where every probability is checkable by hand.

    Train on one doc 'aab': bigrams aa, ab; chars {a, b} -> V=2.
    counts: aa=1, ab=1; n_a. = 2.
      P(a|a) = (1+0.5)/(2+0.5*2) = 0.5
      P(b|a) = (1+0.5)/(2+0.5*2) = 0.5
      unseen continuation 'ac'-> c unseen SECOND char, a seen:
         0.5/(2+1) = 1/6
      unseen first char 'xz' -> 1/V = 0.5
    """
    train = spark.createDataFrame([(0, "aab")], "doc_id long, text string")
    lm = train_char_bigram_lm(train, k=0.5)
    probs = {r["bigram"]: math.exp(r["log_prob"]) for r in lm.collect()}
    assert probs["aa"] == pytest.approx(0.5)
    assert probs["ab"] == pytest.approx(0.5)

    score_df = spark.createDataFrame(
        [(1, "aab"), (2, "ac"), (3, "xz"), (4, "a")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in lm_score(score_df, lm, k=0.5).collect()
    }
    # doc 1: avg(-ln .5, -ln .5) = ln 2
    assert rows[1]["avg_nll"] == pytest.approx(math.log(2), abs=1e-6)
    # doc 2: one bigram 'ac', unseen under seen 'a': -ln(1/6)
    assert rows[2]["avg_nll"] == pytest.approx(math.log(6), abs=1e-6)
    # doc 3: wholly unseen first char: -ln(1/2)
    assert rows[3]["avg_nll"] == pytest.approx(math.log(2), abs=1e-6)
    # doc 4: too short for bigrams -> absent from output
    assert 4 not in rows
    assert rows[1]["ppl"] == pytest.approx(2.0, abs=1e-3)


def test_lm_filter_keeps_low_perplexity(docs):
    lm = train_char_bigram_lm(docs, k=K)
    scores = lm_score(docs, lm, k=K).toPandas().set_index("doc_id")
    cutoff = float(scores["ppl"].median())
    kept = lm_quality_filter(docs, lm, max_ppl=cutoff)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    want = set(scores.index[scores["ppl"] <= cutoff])
    assert kept_ids == want
    assert kept.columns == docs.columns


def test_lm_model_is_bounded_and_plan_broadcasts(docs):
    lm = train_char_bigram_lm(docs, k=K)
    n_chars = (
        docs.select(
            F.explode(F.split(F.col("text"), "")).alias("c")
        )
        .agg(F.countDistinct("c"))
        .first()[0]
    )
    assert lm.count() <= n_chars * n_chars  # |charset|^2 bound
    plan = (
        lm_score(docs, lm, k=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the corpus itself is never shuffled for the joins — only the
    # final per-doc aggregation exchanges on doc_id
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# word-trigram stupid backoff (Brants et al. 2007)
# ---------------------------------------------------------------------------


def _sb_oracle(train_texts, score_texts, alpha=0.4, k=1.0,
               min_count=1, max_ngrams=None):
    """Brute-force python stupid backoff, written independently of
    lm.py (dict counts, per-position chain)."""
    uni, bi, tri = {}, {}, {}
    for t in train_texts:
        ws = [w for w in t.split(" ") if w]
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for i in range(1, len(ws)):
            g = ws[i - 1] + " " + ws[i]
            bi[g] = bi.get(g, 0) + 1
        for i in range(2, len(ws)):
            g = " ".join(ws[i - 2 : i + 1])
            tri[g] = tri.get(g, 0) + 1
    if min_count > 1:
        bi = {g: c for g, c in bi.items() if c >= min_count}
        tri = {g: c for g, c in tri.items() if c >= min_count}
    if max_ngrams is not None:
        def top(d):
            return dict(sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))
                        [:max_ngrams])
        bi, tri = top(bi), top(tri)
    n_tot, v_tot = sum(uni.values()), len(uni)
    out = {}
    for di, t in enumerate(score_texts):
        ws = [w for w in (t or "").split(" ") if w]
        ls = []
        for i in range(2, len(ws)):
            w1, w2, w3 = ws[i - 2], ws[i - 1], ws[i]
            tg, cg, bg = f"{w1} {w2} {w3}", f"{w1} {w2}", f"{w2} {w3}"
            if tg in tri and cg in bi:
                s = tri[tg] / bi[cg]
            elif bg in bi and w2 in uni:
                s = alpha * bi[bg] / uni[w2]
            else:
                s = alpha * alpha * (uni.get(w3, 0) + k) / (n_tot + k * v_tot)
            ls.append(math.log(s))
        if ls:
            out[di] = round(sum(ls) / len(ls), 6)
    return out


def _rand_corpus(rng, n, vocab=12, max_len=14):
    return [
        " ".join(f"w{rng.integers(0, vocab)}"
                 for _ in range(rng.integers(0, max_len)))
        for _ in range(n)
    ]


def test_stupid_backoff_matches_bruteforce(spark):
    import numpy as np

    from protosc_spark.lm import (
        stupid_backoff_score,
        train_stupid_backoff_lm,
    )

    rng = np.random.default_rng(7)
    train = _rand_corpus(rng, 60)
    score = _rand_corpus(rng, 40, vocab=16) + [None, "", "one", "a b"]
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score)], "doc_id long, text string"
    )
    model = train_stupid_backoff_lm(tdf)
    got = {
        r["doc_id"]: r["avg_logscore"]
        for r in stupid_backoff_score(sdf, model).collect()
    }
    want = _sb_oracle(train, score)
    assert got == want  # exact float match after the shared round(6)
    # short/empty/null docs have no trigram positions -> absent
    for di in (len(score) - 4, len(score) - 3, len(score) - 2,
               len(score) - 1):
        assert di not in got


def test_stupid_backoff_pruning_matches_bruteforce(spark):
    import numpy as np

    from protosc_spark.lm import (
        stupid_backoff_score,
        train_stupid_backoff_lm,
    )

    rng = np.random.default_rng(11)
    train = _rand_corpus(rng, 80, vocab=8)
    score = _rand_corpus(rng, 30, vocab=10)
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score)], "doc_id long, text string"
    )
    model = train_stupid_backoff_lm(tdf, min_count=2, max_ngrams=25)
    got = {
        r["doc_id"]: r["avg_logscore"]
        for r in stupid_backoff_score(sdf, model).collect()
    }
    want = _sb_oracle(train, score, min_count=2, max_ngrams=25)
    assert got == want


def test_stupid_backoff_plan_no_python(spark):
    from protosc_spark.lm import (
        stupid_backoff_score,
        train_stupid_backoff_lm,
    )

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c")], "doc_id long, text string"
    )
    model = train_stupid_backoff_lm(docs)
    p = stupid_backoff_score(
        docs, model
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "CartesianProduct" not in p


# ---------------------------------------------------------------------------
# good_turing (Simple Good-Turing, Gale & Sampson 1995)
# ---------------------------------------------------------------------------

def _sgt_ref(coc, unit=10**9):
    """Python SGT over a count-of-counts dict {r: N_r}."""
    import math

    rs = sorted(coc)
    Z = {}
    for i, r in enumerate(rs):
        q = rs[i - 1] if i > 0 else 0
        t = rs[i + 1] if i + 1 < len(rs) else 2 * r - q
        Z[r] = coc[r] / (0.5 * (t - q))
    m = len(rs)
    sx = sum(math.floor(math.log(r) * unit) for r in rs)
    sy = sum(math.floor(math.log(Z[r]) * unit) for r in rs)
    sxx = sum(
        math.floor(math.log(r) * math.log(r) * unit) for r in rs
    )
    sxy = sum(
        math.floor(math.log(r) * math.log(Z[r]) * unit) for r in rs
    )
    b = (m * sxy * unit - sx * sy) / (m * sxx * unit - sx * sx)
    switch = None
    rows = {}
    for i, r in enumerate(rs):
        rp1 = r + 1
        lgt = rp1 * math.exp(b * (math.log(rp1) - math.log(r)))
        contiguous = i + 1 < len(rs) and rs[i + 1] == r + 1
        cand = False
        tur = None
        if contiguous:
            nn = coc[r + 1]
            tur = rp1 * nn / coc[r]
            th = 1.65 * math.sqrt(
                rp1 * rp1 * (nn / coc[r] ** 2) * (1 + nn / coc[r])
            )
            cand = abs(tur - lgt) > th
        if not cand and switch is None:
            switch = r
        rows[r] = (lgt, tur, cand)
    out = {}
    qmass = 0
    for r in rs:
        lgt, tur, cand = rows[r]
        used = cand and (switch is None or r < switch)
        rstar = tur if used else lgt
        qmass += math.floor(rstar * coc[r] * unit)
        out[r] = (rstar, used)
    N = sum(r * nr for r, nr in coc.items())
    p0 = coc.get(1, 0) / N
    return {
        r: (rstar, used, (1 - p0) * rstar / (qmass / unit), p0)
        for r, (rstar, used) in out.items()
    }


def test_good_turing_matches_reference_and_uses_turing_head(spark):
    from protosc_spark.lm import good_turing

    # classic hapax-heavy count-of-counts (Gale-Sampson shape);
    # large enough that the Turing head is significant: Turing used
    # for r = 1..3, permanent LGT switch at r = 4
    coc = {1: 10000, 2: 2000, 3: 800, 4: 400, 5: 220, 6: 150,
           7: 100, 10: 30}
    words = []
    wid = 0
    for r, nr in coc.items():
        for _ in range(nr):
            words.extend([f"w{wid}"] * r)
            wid += 1
    # chunk into documents of 40 tokens
    docs = [
        ("a", " ".join(words[i:i + 40]))
        for i in range(0, len(words), 40)
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {r.r: r for r in good_turing(df, "source").collect()}
    want = _sgt_ref(coc)
    assert set(got) == set(want)
    for r, (rstar, used, pr, p0) in want.items():
        g = got[r]
        assert g.n_r == coc[r]
        assert abs(g.r_star - rstar) < 1e-9
        assert g.used_turing == used
        assert abs(g.p_r - pr) < 1e-12
        assert abs(g.p0 - p0) < 1e-15
    # the head of a hapax-heavy curve uses the Turing estimates and
    # discounts (r* < r); the tail has switched to LGT permanently
    assert got[1].used_turing and got[1].r_star < 1.0
    assert got[2].used_turing and got[3].used_turing
    assert not any(got[r].used_turing for r in (4, 5, 6, 7, 10))
    assert abs(
        got[1].p0 - 10000 / sum(r * n for r, n in coc.items())
    ) < 1e-15
    # probabilities of seen types + p0 sum to ~1
    total = got[1].p0 + sum(
        g.p_r * g.n_r for g in got.values()
    )
    assert abs(total - 1.0) < 1e-6


def test_good_turing_degenerate_single_frequency(spark):
    from protosc_spark.lm import good_turing

    # every word appears exactly twice: one distinct frequency, no
    # line to fit -> no rows
    df = spark.createDataFrame(
        [("a", "x x y y z z")], "source string, text string"
    )
    assert good_turing(df, "source").count() == 0


def test_good_turing_plan_no_python(spark):
    from protosc_spark.lm import good_turing

    df = spark.createDataFrame(
        [("a", "x x y")], "source string, text string"
    )
    plan = (
        good_turing(df, "source")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
