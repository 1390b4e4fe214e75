"""spark-submit driver script:
    spark-submit --py-files colbert_live_spark.zip jobs.py <cmd> ...
Delegates to colbert_live_spark.cli (shipped in the zip)."""

from colbert_live_spark.cli import main

if __name__ == "__main__":
    main()
