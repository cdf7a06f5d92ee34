"""TableIO shim: Iceberg-shaped tables, parquet-backed in this sandbox.

The production deployment reads/writes Iceberg (`spark.read.table` /
`df.writeTo(...).using('iceberg')`); no Iceberg runtime jar ships in this
sandbox, so the same call sites fall back to partitioned parquet with an
identical schema and partition layout. Switching `fmt='iceberg'` against a
real catalog changes no caller code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ]
)


class TableIO:
    def __init__(self, spark: SparkSession, fmt: str = "parquet"):
        if fmt not in ("parquet", "iceberg"):
            raise ValueError(f"unsupported format: {fmt}")
        self.spark = spark
        self.fmt = fmt

    def write(
        self,
        df: DataFrame,
        path: str,
        partition_by: list[str] | None = None,
        bucket_by: tuple[int, str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        if self.fmt == "iceberg":
            writer = df.writeTo(path).using("iceberg")
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.append()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        if bucket_by:
            n, col = bucket_by
            # parquet bucketing requires saveAsTable; emulate with repartition
            df = df.repartition(n, col)
            w = df.write.mode(mode)
            if partition_by:
                w = w.partitionBy(*partition_by)
        w.parquet(path)

    def write_bucketed_edges(
        self,
        edges: DataFrame,
        table_name: str,
        path: str,
        buckets: int = 64,
        key: str = "src",
    ) -> None:
        """Persist an edge table hash-bucketed (and sorted) by ``key``.

        Bucketing is the co-location contract that makes the hot joins
        exchange-free: every `edges JOIN ranks ON src` / `groupBy(src)`
        downstream reads pre-partitioned, pre-sorted buckets instead of
        shuffling the 100-TB edge set per query (plan-audited in
        tests/test_plan_audits.py — bucketed self-join: zero Exchange).

        Parquet path: ``bucketBy().sortBy().saveAsTable`` with an explicit
        ``path`` (external table; metadata in the session catalog, a real
        metastore in production). Iceberg path: the same layout via a
        ``bucket(n, key)`` partition transform; ``path`` is ignored there
        (the catalog owns the location). Rows are NOT pre-clustered by the
        transform value (Spark exposes no bucket() expression outside
        partitionedBy), so the writer must not assume clustered input:
        fanout writers are enabled on the table, and in-file ordering is the
        table's concern (``ALTER TABLE ... WRITE ORDERED BY src`` against a
        real catalog), not this writer's.
        """
        if self.fmt == "iceberg":
            from pyspark.sql import functions as F

            (
                edges.writeTo(table_name)
                .using("iceberg")
                .tableProperty("write.spark.fanout.enabled", "true")
                .partitionedBy(F.bucket(buckets, key))
                .createOrReplace()
            )
            return
        (
            edges.write.mode("overwrite")
            .option("path", path)
            .bucketBy(buckets, key)
            .sortBy(key, "dst")
            .saveAsTable(table_name)
        )

    def read_table(self, table_name: str) -> DataFrame:
        return self.spark.table(table_name)

    def read(self, path: str, schema: T.StructType | None = None) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.read.table(path)
        r = self.spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.parquet(path)


def write_pages_fixture(spark: SparkSession, path: str, n_pages: int = 64, seed: int = 7, **kw) -> DataFrame:
    """Materialize the deterministic pages fixture as an Iceberg-shaped table.

    The ``text`` column is filled through the reference extractor so the table
    matches the input_hint schema exactly.
    """
    from pagerank_spark.fixtures import synth_pages
    from pagerank_spark.functions.extract import extract_text_py

    rows = synth_pages(n_pages=n_pages, seed=seed, **kw)
    data = [
        (r["url"], r["warc_ts"], r["html"], extract_text_py(r["html"]), r["lang"])
        for r in rows
    ]
    df = spark.createDataFrame(data, PAGES_SCHEMA)
    TableIO(spark).write(df, path)
    return spark.read.schema(PAGES_SCHEMA).parquet(path)
