from .upsert import upsert, insert_if_absent
from .scd2 import scd2_apply

__all__ = ["upsert", "insert_if_absent", "scd2_apply"]
