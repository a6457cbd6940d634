"""spark-submit entry points (SURVEY.md §7.1 M7):

  spark-submit --py-files gensim_spark.zip gensim_spark/jobs/build_index.py \\
      --input pages_parquet --output index_dir [--resume]
  spark-submit --py-files gensim_spark.zip gensim_spark/jobs/query_index.py \\
      --index index_dir --query "text" [--k 10]
"""
