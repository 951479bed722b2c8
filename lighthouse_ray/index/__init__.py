from .reader import IndexReader, TermPostings

__all__ = ["IndexReader", "TermPostings"]
