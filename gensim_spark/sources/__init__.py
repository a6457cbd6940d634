"""Corpus sources/sinks: synthetic page generator, Matrix Market and
text-format corpus readers/writers (SURVEY.md §2.1)."""

from gensim_spark.sources import synth  # noqa: F401
