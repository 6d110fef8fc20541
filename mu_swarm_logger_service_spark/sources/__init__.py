"""Ingestion sources & sinks — SURVEY.md §2.1 rows 3-6 (reference parity).

The reference's entire job [pub:muswarmlogger/main.py]: subscribe to Docker
events, filter/enrich, attach to container logs, write RDF triples.
Re-expressed Spark-first: explicit-schema JSON/text file sources (modeling
the Docker socket as a replayable stream), Catalyst-native parsing, and an
idempotent partitioned triple sink — batch and readStream share every
transformation.
"""

from . import container_logs, docker_events, sparql, triples  # noqa: F401
