"""Sources: batch/streaming readers over the engine's table registry."""

from steaminganalysis_spark.sources.registry import load, load_all

__all__ = ["load", "load_all"]
