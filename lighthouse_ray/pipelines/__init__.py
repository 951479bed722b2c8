from .driver_queries import make_oracle_sql, make_queries

__all__ = ["make_queries", "make_oracle_sql"]
