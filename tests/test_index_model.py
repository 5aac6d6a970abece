"""Model-based mutation testing: a pseudo-random (seeded, deterministic)
sequence of append/delete/upsert/compact ops runs against both the real
VectorIndex and an in-memory dict model; state must agree after every
step. Catches interaction bugs single-op tests can't (offset drift
across interleaved mutations, delete-of-upserted-id, compaction during
churn)."""

import random

from weaviate_txtai_spark.index import VectorIndex


def _model_vec(rng, dim=4):
    return [round(rng.uniform(-1, 1), 3) for _ in range(dim)]


def test_random_mutation_sequence_matches_model(spark, tmp_path):
    rng = random.Random(1234)
    idx = VectorIndex(spark, str(tmp_path / "model_idx")).create()
    model: dict[int, list[float]] = {}
    offset = 0

    for step in range(30):
        op = rng.choice(["append", "append", "delete", "upsert", "compact"])
        if op == "append":
            n = rng.randint(1, 4)
            vecs = [_model_vec(rng) for _ in range(n)]
            idx.append(vecs)
            for i, v in enumerate(vecs):
                model[offset + i] = v
            offset += n
        elif op == "delete" and model:
            ids = rng.sample(sorted(model), min(len(model), rng.randint(1, 3)))
            idx.delete(ids)
            for i in ids:
                del model[i]
        elif op == "upsert" and model:
            # mix of updates to live ids and inserts beyond the offset
            items = []
            for i in rng.sample(sorted(model), min(len(model), 2)):
                items.append((i, _model_vec(rng)))
            new_id = offset + rng.randint(0, 1)
            items.append((new_id, _model_vec(rng)))
            idx.upsert(items)
            for i, v in items:
                model[i] = v
            offset = max(offset, new_id + 1)
        elif op == "compact" and model:
            idx.compact(target_rows_per_file=7)

        assert idx.count() == len(model), f"step {step}: count drift"
        assert idx.offset == offset, f"step {step}: offset drift"

    # final full-state equality, vectors included
    stored = {
        r["docid"]: [round(float(x), 3) for x in r["vector"]]
        for r in idx.to_df().collect()
    }
    assert stored == model
    # docids unique all along (uuid column too)
    uuids = [r["uuid"] for r in idx.to_df().select("uuid").collect()]
    assert len(uuids) == len(set(uuids))
