from .parity import dsum, davg, DSUM_SQL, DAVG_SQL

__all__ = ["dsum", "davg", "DSUM_SQL", "DAVG_SQL"]
