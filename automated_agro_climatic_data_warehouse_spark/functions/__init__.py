from .parity import dsum, davg, DSUM_SQL, DAVG_SQL
from .zorder import normalize_rank, write_zordered, zvalue

__all__ = [
    "dsum",
    "davg",
    "DSUM_SQL",
    "DAVG_SQL",
    "normalize_rank",
    "write_zordered",
    "zvalue",
]
