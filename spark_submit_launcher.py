"""spark-submit entry point for the CLI.

spark-submit takes a script file (it has no `-m` module mode), so ship the
package zip alongside this one-liner:

    spark-submit --py-files pagerank_spark.zip spark_submit_launcher.py \
        --data pages.parquet --filter_ratio 0.2 --search_query corona

Build the zip with `python tools/make_pyfiles_zip.py`.
"""

from pagerank_spark.cli import main

if __name__ == "__main__":
    main()
