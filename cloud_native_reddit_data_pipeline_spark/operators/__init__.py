from . import dedup, relational, similarity, textstats, topics, windows

__all__ = ["relational", "dedup", "similarity", "textstats", "topics", "windows"]
