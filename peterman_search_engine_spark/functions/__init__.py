from .stopwords import STOP_WORDS
from .stemmer import porter_stem

__all__ = ["STOP_WORDS", "porter_stem"]
