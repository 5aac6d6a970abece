"""End-to-end walkthrough mirroring the reference's example notebook
(reference examples/01_simple.ipynb) on the Spark-native engine.

Run: python examples/simple.py
Each section cites the notebook cell it reproduces.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from weaviate_txtai_spark import Embeddings

DATA = [
    "US tops 5 million confirmed virus cases",
    "Canada's last fully intact ice shelf has suddenly collapsed, "
    "forming a Manhattan-sized iceberg",
    "Beijing mobilises invasion craft along coast as Taiwan tensions escalate",
    "The National Park Service warns against sacrificing slower friends "
    "in a bear attack",
    "Maine man wins $1M from $25 lottery ticket",
    "Make huge profits without work, earn up to $100,000 a day",
]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("weaviate_txtai_spark-example")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = Embeddings(spark)

    # cell 7: ad-hoc similarity, no index
    print("similarity('feel good story', data):")
    for idx, score in emb.similarity("feel good story", DATA):
        print(f"  {score:+.4f}  {DATA[idx][:60]}")

    # cells 9-13: index + semantic search
    emb.index([(i, t, None) for i, t in enumerate(DATA)])
    for query in ("feel good story", "climate change", "war"):
        uid, score = emb.search(query, 1)[0]
        print(f"search({query!r}) -> [{uid}] {DATA[int(uid)][:50]}  ({score:.4f})")

    # cells 17-19: upsert visibility
    emb.upsert([("maine", "Maine man wins lottery, feel good story", None)])
    uid, _ = emb.search("feel good story", 1)[0]
    print(f"after upsert -> {uid}")
    emb.delete(["maine"])

    # cells 24-27: SQL dialect with metadata + aggregates
    rows = emb.search(
        "select text, score from txtai where similar('huge profits') "
        "and score >= 0.0 and length >= 40"
    )
    print("sql similar + predicates:", rows[0]["text"][:50])
    print(
        "aggregates:",
        emb.search(
            "select count(*) as n, min(length) as mn, max(length) as mx, "
            "sum(length) as total from txtai"
        ),
    )

    # cells 21-22: content storage mode — search returns row dicts
    emb_content = Embeddings(spark, config={"content": True, "objects": True})
    emb_content.index([(i, t, None) for i, t in enumerate(DATA)])
    print(
        "content mode:", emb_content.search("feel good story", 1)[0]["text"][:50]
    )

    # cell 29: binary object payloads through scored SQL
    emb.index(
        [
            ("img", {"text": "a red fox in the snow", "object": b"\x89PNG..."}, None)
        ]
    )
    row = emb.search(
        "select object from txtai where similar('fox') order by score desc limit 1"
    )[0]
    print("object payload roundtrip:", bytes(row["object"]))

    spark.stop()


if __name__ == "__main__":
    main()
