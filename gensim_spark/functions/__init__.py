from gensim_spark.functions import textprep, textref  # noqa: F401
