"""OpenAlex ingest: streaming works filter + manifest-diff incremental sync.

Replaces the reference's L0 native filter + L4 download pipeline
(SURVEY.md §1 L0/L4; reference Makefile:57-66,89-96).
"""

from .oa_filter import filter_works_lines, OaJsonlFilter, ensure_filter_built

__all__ = ["filter_works_lines", "OaJsonlFilter", "ensure_filter_built"]
