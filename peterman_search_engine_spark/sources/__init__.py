from .transcripts import generate_transcripts, TIERS
from .adapters import corpus_from_transcripts, corpus_from_documents

__all__ = [
    "generate_transcripts",
    "TIERS",
    "corpus_from_transcripts",
    "corpus_from_documents",
]
