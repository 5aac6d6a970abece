"""Multinomial Naive Bayes text classifier (train + classify).

The classic generative classifier (McCallum & Nigam 1998) that
large-corpus pipelines still use as a cheap first-pass router —
language ID, topic bucketing, quality-tier pre-filters — before
anything neural sees the data. With add-alpha smoothing:

    score(d, c) = log P(c) + Σ_{t ∈ d} tf_dt · log p(t|c)
    p(t|c)      = (cnt(t,c) + α) / (N_c + α·V)

Out-of-vocabulary test tokens are DROPPED (the standard known-vocab
multinomial treatment): keeping them would add a per-class floor term
that does not cancel across classes yet carries no training signal.

Decomposition used by the plan (avoids materializing the dense
term×class grid): with llh(t,c) = log(cnt(t,c)+α),

    score(d,c) = Σ_t tf_dt · llh(t,c)                [sparse part]
               + log(n_docs_c / n_docs)              [prior]
               − n_d · log(N_c + α·V)                [per-class norm]

so only the OBSERVED (test-term, class) pairs are ever joined; the
zero-count pairs contribute through the coalesce-to-α inside llh.

Scale shape: train-side counts are two partial-agg shuffles (term×class,
class); the class table is tiny and broadcast; the test token stream
inner-joins the train vocab (shuffle on term), fans out by the
broadcast class list (|C| rows each — single digits), left-joins the
term×class counts on (term, class), then one groupBy(doc, class).
Nothing driver-side; no dense V×C grid.

Cross-engine determinism: per-(doc, class) scores are float log sums
rounded at ``round_decimals`` (the trigram-NLL discipline); the argmax
tie-break is (rounded score DESC, class ASC), replayable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from weaviate_txtai_spark.cache import scoped_persist
from weaviate_txtai_spark.functions.text import tokens


def nb_classify(
    train: DataFrame,
    test: DataFrame,
    *,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    round_decimals: int = 6,
) -> DataFrame:
    """Train multinomial NB on ``train`` and classify ``test``.

    Output: ``id_col, pred, score`` — one row per test doc that has at
    least one in-vocabulary token (empty / fully-OOV docs carry no
    evidence and are omitted), ``score`` the winning class's rounded
    log-joint.
    """
    if alpha <= 0:
        raise ValueError("nb_classify: alpha must be > 0")
    toks = tokens(text_col)

    # a NULL train label would train a phantom class that can WIN
    # predictions (pred=NULL); a NULL test id would lump every unkeyed
    # test doc's tokens into one scored pseudo-document
    train = train.filter(F.col(label_col).isNotNull())
    test = test.filter(F.col(id_col).isNotNull())

    train_stream = train.select(
        F.col(label_col).alias("__c"), F.explode(toks).alias("__t")
    )
    ctc = scoped_persist(
        train_stream.groupBy("__c", "__t").agg(
            F.count(F.lit(1)).alias("__n")
        )
    )
    # class stats: token mass N_c and doc prior; both tiny (|C| rows)
    cls = ctc.groupBy("__c").agg(F.sum("__n").alias("__nc"))
    priors = train.groupBy(F.col(label_col).alias("__c")).agg(
        F.count(F.lit(1)).alias("__dc")
    )
    # scalar corpus stats stay 1-row DataFrames (no driver-side count():
    # the plan remains lazy and the scalars ride broadcast joins)
    vstats = ctc.select("__t").distinct().agg(
        F.count(F.lit(1)).alias("__v")
    )
    tstats = train.agg(F.count(F.lit(1)).alias("__ndocs"))
    classes = scoped_persist(
        cls.join(priors, "__c")
        .join(F.broadcast(vstats))
        .join(F.broadcast(tstats))
        .select(
            "__c",
            F.log(F.col("__dc") / F.col("__ndocs")).alias("__logprior"),
            F.log(
                F.col("__nc") + F.lit(alpha) * F.col("__v")
            ).alias("__lognorm"),
        )
    )

    vocab = ctc.select("__t").distinct()
    test_tf = (
        test.select(F.col(id_col), F.explode(toks).alias("__t"))
        .join(vocab, "__t")  # drop OOV
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    scored = (
        test_tf.join(F.broadcast(classes.select("__c")))
        .join(ctc, ["__c", "__t"], "left")
        .groupBy(id_col, "__c")
        .agg(
            F.sum(
                F.col("__tf")
                * F.log(F.coalesce(F.col("__n"), F.lit(0)) + F.lit(alpha))
            ).alias("__s"),
            F.sum("__tf").alias("__nd"),
        )
        .join(F.broadcast(classes), "__c")
        .select(
            id_col,
            F.col("__c"),
            F.round(
                F.col("__s")
                + F.col("__logprior")
                - F.col("__nd") * F.col("__lognorm"),
                round_decimals,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("__c")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, F.col("__c").alias("pred"), "score")
    )
