from . import sortkeys, readstats, dedup

__all__ = ["sortkeys", "readstats", "dedup"]
