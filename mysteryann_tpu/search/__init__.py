from mysteryann_tpu.search.beam import beam_search, search_batched, SearchResult  # noqa: F401
from mysteryann_tpu.search.searcher import Searcher  # noqa: F401
