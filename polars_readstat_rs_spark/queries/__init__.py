"""Query registry: importing this package registers the relational and
LLM-pipeline suites."""

from . import llm, llm2, pipeline, readstat, relational, relational2, streaming_q  # noqa: F401  (registration side effects)
from .registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
