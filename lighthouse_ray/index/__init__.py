from .reader import IndexReader, RangeReader, SlicedPostings, TermPostings

__all__ = ["IndexReader", "RangeReader", "SlicedPostings", "TermPostings"]
