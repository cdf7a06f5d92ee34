"""Synchronous label propagation (Raghavan, Albert, Kumara 2007).

Per round every vertex simultaneously adopts the most frequent label among
its distinct neighbors (undirected, self-loops ignored); ties broken by the
SMALLEST label — the deterministic tie-break the north rule needs for
"assignments match exactly". Vertices with no neighbors keep their label.

Spark shape per round: edges ⋈ labels on one side → groupBy(vertex, label)
count → argmax via row_number over Window.partitionBy(vertex) — two shuffles,
both on vertex keys; hub skew is bounded because the message table is
(edge count) rows, and AQE skew-join splitting handles power-law vertices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    max_iterations: int = 10,
    num_partitions: int | None = None,
    stop_when_stable: bool = True,
) -> DataFrame:
    """Return (url, label). Labels initialized to the vertex id."""
    spark = edges.sparkSession
    num_partitions = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    both = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .repartition(num_partitions, "v")
        .persist()
    )
    vertices = (
        edges.select(F.col("src").alias("url"))
        .union(edges.select(F.col("dst").alias("url")))
        .distinct()
        .repartition(num_partitions, "url")
        .persist()
    )
    labels = vertices.select("url", F.col("url").alias("label")).localCheckpoint(eager=True)

    w = Window.partitionBy("u").orderBy(F.desc("_cnt"), F.asc("label"))
    for _ in range(max_iterations):
        msgs = both.join(
            labels.select(F.col("url").alias("v"), "label"), "v"
        ).select("u", "label")
        best = (
            msgs.groupBy("u", "label")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(F.col("u").alias("url"), F.col("label").alias("_new"))
        )
        new_labels = (
            labels.join(best, "url", "left")
            .select(
                "url",
                F.coalesce(F.col("_new"), F.col("label")).alias("label"),
                (~F.coalesce(F.col("_new") == F.col("label"), F.lit(True))).alias("_chg"),
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.where(F.col("_chg")).limit(1).count() > 0
        old = labels
        labels = new_labels.select("url", "label")
        old.unpersist()
        if stop_when_stable and not changed:
            break
    both.unpersist()
    vertices.unpersist()
    return labels
