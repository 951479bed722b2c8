from .engine import SearchEngine, SearchError

__all__ = ["SearchEngine", "SearchError"]
