"""Repeated-passage detection (operators/passages.py)."""

import pytest

from pyspark.sql import functions as F

from weaviate_txtai_spark.operators.passages import (
    repeated_passage_stats,
    repeated_passages,
    window_doc_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BOILER = "this site uses cookies to improve your browsing experience ok"  # 10 tokens


def test_hand_computed_stats(spark):
    # doc 1: boiler + unique tail; doc 2: unique head + boiler; doc 3: unique
    docs = _docs(
        spark,
        [
            (1, BOILER + " alpha beta gamma delta epsilon zeta eta theta"),
            (2, "iota kappa lamda mu nu xi omicron pi " + BOILER),
            (3, "rho sigma tau upsilon phi chi psi omega aa bb cc dd ee ff"),
        ],
    )
    stats = {
        r["doc_id"]: r
        for r in repeated_passage_stats(docs, k=8, min_docs=2).collect()
    }
    # each doc: 18 tokens -> 11 windows of 8
    assert stats[1]["n_windows"] == 11
    # the 10-token boiler yields 3 shared 8-windows per doc
    assert stats[1]["n_repeated"] == 3
    assert stats[2]["n_repeated"] == 3
    assert stats[3]["n_repeated"] == 0
    assert stats[3]["keep"] is True
    assert abs(stats[1]["repeated_ratio"] - round(3 / 11, 6)) < 1e-9
    inv = repeated_passages(docs, k=8, min_docs=2).collect()
    assert len(inv) == 3 and all(r["n_docs"] == 2 for r in inv)


def test_short_and_empty_docs_kept(spark):
    docs = _docs(spark, [(1, "only three tokens"), (2, ""), (3, "x " * 4)])
    rows = {r["doc_id"]: r for r in repeated_passage_stats(docs, k=8).collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert r["n_windows"] == 0 and r["repeated_ratio"] == 0.0 and r["keep"]


def test_intra_doc_repeat_not_cross_doc(spark):
    # the same window twice inside ONE doc is not a repeated passage
    eight = "a b c d e f g h"
    docs = _docs(spark, [(1, eight + " z " + eight), (2, "p q r s t u v w")])
    stats = {r["doc_id"]: r for r in repeated_passage_stats(docs, k=8).collect()}
    assert stats[1]["n_repeated"] == 0
    # but it counts twice in n_windows (positions, not distinct windows)
    pairs = window_doc_pairs(docs, k=8).filter(F.col("doc_id") == 1).collect()
    assert any(r["n_occ"] == 2 for r in pairs)


def test_hash_modes_agree(spark, sf_dir):
    from weaviate_txtai_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = repeated_passage_stats(docs, k=8, hash_mode="md5")
    b = repeated_passage_stats(docs, k=8, hash_mode="xxhash64")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_ngram_containment_scores(spark):
    from weaviate_txtai_spark.operators.passages import ngram_containment

    train = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    evals = spark.createDataFrame(
        [
            (10, "a b c d e f g h i j"),   # fully contained -> 1.0
            (11, "a b c d e f g h zz yy"), # 1 of 3 windows hit
            (12, "q r s t u v w x y z"),   # novel -> 0.0
            (13, "too short"),             # < k tokens -> surfaced NULL
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in ngram_containment(evals, train, k=8).collect()
    }
    assert got[10]["containment"] == 1.0
    assert got[11]["n_windows"] == 3 and got[11]["n_hit"] == 1
    assert got[11]["containment"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[12]["containment"] == 0.0 and got[12]["n_hit"] == 0
    assert got[13]["n_windows"] == 0 and got[13]["containment"] is None
    # md5 oracle mode == xxhash64 production mode
    md5 = sorted(
        (r["doc_id"], r["n_hit"])
        for r in ngram_containment(evals, train, k=8, hash_mode="md5").collect()
    )
    xx = sorted(
        (r["doc_id"], r["n_hit"])
        for r in ngram_containment(evals, train, k=8, hash_mode="xxhash64").collect()
    )
    assert md5 == xx


# --------------------------------------------------------------------------
# Round 7: winnowing (Schleimer 2003) + shared verbatim runs (Lee 2021)
# --------------------------------------------------------------------------

from weaviate_txtai_spark.operators.passages import (  # noqa: E402
    shared_runs,
    winnow_fingerprints,
    winnow_pairs,
)


def _hash_tok(t: str) -> int:
    return ord(t[0]) * 31 + len(t)


def _kgram_hashes(text: str, k: int, base=131, mod=1_000_000_007):
    toks = text.split()
    out = []
    for i in range(len(toks) - k + 1):
        acc = 0
        for t in toks[i : i + k]:
            acc = (acc * base + _hash_tok(t)) % mod
        out.append(acc)
    return out


def _winnow_ref(text: str, k: int, w: int):
    """Reference winnowing: rightmost-min per window, deduped."""
    kg = _kgram_hashes(text, k)
    if not kg:
        return set()
    wl = min(len(kg), w)
    sel = set()
    for j in range(len(kg) - wl + 1):
        best_h, best_p = None, None
        for p in range(j, j + wl):
            if best_h is None or kg[p] <= best_h:
                best_h, best_p = kg[p], p
        sel.add((best_p + 1, best_h))  # 1-based pos
    return sel


def test_winnow_matches_reference_impl(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "pack my box with five dozen liquor jugs right now ok fine"),
        (3, "a b c d e f"),            # m=2 k-grams < w -> one global min
        (4, "one two three four five"),  # exactly k tokens -> 1 k-gram
        (5, "too short"),               # < k tokens -> nothing
    ]
    docs = _docs(spark, texts)
    got = {
        did: {(r["pos"], r["fp"]) for r in rows}
        for did, rows in _group(
            winnow_fingerprints(docs, k=5, w=4).collect(), "doc_id"
        ).items()
    }
    for did, text in texts:
        assert got.get(did, set()) == _winnow_ref(text, 5, 4), did


def _group(rows, key):
    out = {}
    for r in rows:
        out.setdefault(r[key], []).append(r)
    return out


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    # ANY shared verbatim run of >= w+k-1 tokens must share a fingerprint
    # (the paper's correctness guarantee) — k=5, w=4 -> 8 tokens.
    run = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = _docs(
        spark,
        [
            (1, "x1 y1 z1 " + run + " q1 r1 s1"),
            (2, "m2 n2 " + run + " v2 w2 x2 y2 z2"),
        ],
    )
    by_doc = _group(winnow_fingerprints(docs, k=5, w=4).collect(), "doc_id")
    f1 = {r["fp"] for r in by_doc[1]}
    f2 = {r["fp"] for r in by_doc[2]}
    assert f1 & f2, "shared 8-token run produced no shared fingerprint"


def test_winnow_density_bound(spark):
    # winnowing selects at most one fingerprint per window START, and at
    # least one per w consecutive positions
    text = " ".join(f"tok{i % 17}x{i % 5}" for i in range(100))
    docs = _docs(spark, [(1, text)])
    rows = winnow_fingerprints(docs, k=5, w=4).collect()
    positions = sorted(r["pos"] for r in rows)
    m = 100 - 4  # k-grams
    assert len(positions) <= m - 4 + 1
    gaps = [b - a for a, b in zip(positions, positions[1:])]
    assert all(g <= 4 for g in gaps), gaps


def test_winnow_pairs_containment(spark):
    # vary first char AND length: the per-token hash is ascii(first)*31+len,
    # so same-shaped tokens (s0..s9) would collapse to ONE fingerprint value
    shared = " ".join(
        f"{c}{'x' * i}" for i, c in enumerate("abcdefghijklmnopqrst")
    )  # 20 tokens, all distinct hashes
    docs = _docs(
        spark,
        [
            (1, shared + " tail1 only1 here1 now1"),
            (2, "head2 first2 " + shared),
            (3, "nothing in common with the others at all whatsoever today"),
        ],
    )
    rows = winnow_pairs(docs, k=5, w=4, min_shared=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["d1"], r["d2"]) == (1, 2)
    assert r["n_shared"] >= 2 and 0 < r["containment"] <= 1.0


def test_shared_runs_exact_length(spark):
    # a shared run of exactly 15 tokens embedded in distinct contexts:
    # matched 8-gram positions = 8 consecutive -> run_tokens = 8 + 7 = 15
    run = " ".join(f"clone{i}" for i in range(15))
    docs = _docs(
        spark,
        [
            (1, "a1 b1 c1 " + run + " d1 e1"),
            (2, "p2 " + run + " q2 r2 s2 t2"),
            (3, "u3 v3 w3 x3 y3 z3 aa3 bb3 cc3 dd3 ee3 ff3 gg3 hh3 ii3"),
        ],
    )
    rows = shared_runs(docs, k=8, min_run_tokens=12).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["d1"], r["d2"]) == (1, 2)
    assert r["max_run_tokens"] == 15 and r["n_runs"] == 1


def test_shared_runs_below_threshold_dropped(spark):
    run = " ".join(f"bit{i}" for i in range(10))  # 10 < min_run_tokens=12
    docs = _docs(
        spark,
        [(1, "a b c " + run), (2, run + " x y z w v")],
    )
    assert shared_runs(docs, k=8, min_run_tokens=12).count() == 0


def test_shared_runs_two_separate_runs(spark):
    r1 = " ".join(f"one{i}" for i in range(12))
    r2 = " ".join(f"two{i}" for i in range(13))
    docs = _docs(
        spark,
        [
            (1, r1 + " break1a break1b break1c " + r2),
            (2, r2 + " gap2a gap2b gap2c gap2d " + r1),
        ],
    )
    rows = shared_runs(docs, k=8, min_run_tokens=12).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_runs"] == 2 and r["max_run_tokens"] == 13


def test_shared_runs_hash_mode_parity(spark):
    run = " ".join(f"par{i}" for i in range(14))
    docs = _docs(
        spark,
        [(1, "aa bb cc " + run + " dd"), (2, "ee ff " + run + " gg hh")],
    )
    md5 = sorted(
        tuple(r) for r in shared_runs(docs, k=8, hash_mode="md5").collect()
    )
    xx = sorted(
        tuple(r)
        for r in shared_runs(docs, k=8, hash_mode="xxhash64").collect()
    )
    assert md5 == xx
