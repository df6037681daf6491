"""Online serving: query encode -> shard-parallel search -> hydration.

Replaces the reference's `abstracts-index` HF Space (SURVEY.md §1 L5,
§3.5; reference README.md:18-29): encode the query with the s2p_query
prompt, search the tuned index, map positions to OpenAlex IDs via
ids.parquet, hydrate titles/authors live from the OpenAlex API.
"""

from .engine import SearchEngine

__all__ = ["SearchEngine"]
