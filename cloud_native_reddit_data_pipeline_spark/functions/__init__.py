from . import sentiment, text, timeops, vectors

__all__ = ["text", "timeops", "sentiment", "vectors"]
