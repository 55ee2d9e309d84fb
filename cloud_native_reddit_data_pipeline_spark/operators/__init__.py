from . import dedup, recommend, relational, similarity, sketches, textstats, topics, windows

__all__ = ["relational", "dedup", "similarity", "sketches", "textstats", "topics", "windows", "recommend"]
