"""Batch operator library — every module registers queries into
:mod:`steaminganalysis_spark.registry` at import time."""
