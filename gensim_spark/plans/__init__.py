"""Composed end-to-end plans: corpus → vocab → postings → weights → query."""

from gensim_spark.plans import pipeline  # noqa: F401
